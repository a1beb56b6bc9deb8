#!/usr/bin/env python
"""Best-effort repro of the XLA:CPU LLVM segfault (pytest.ini fence).

Observed r3/r4: a single pytest process that had compiled ~225 tests'
worth of XLA:CPU executables segfaulted inside LLVM while compiling the
full-depth (max_bounces=8) megakernel-VJP program; the same compile
succeeds every time in a fresh process. This script simulates the
load: compile N varied small programs (distinct shapes so each is a
fresh LLVM module), then the big linearized-scan VJP, and reports
survival. Run under a loop to hunt:

    for i in $(seq 20); do JAX_PLATFORMS=cpu python \
        tools/experiments/llvm_segfault_repro.py || echo CRASH; done

r5 status: 3 runs x 300 warm-up programs each — no crash reproduced
outside the full pytest process. Recorded here + pytest.ini; with zero
network egress in this environment an upstream issue cannot be filed,
so the xdist-2 fence stays with this script as the hunting tool.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import dataclasses

import jax.numpy as jnp
import numpy as np

N_WARM = int(sys.argv[1]) if len(sys.argv) > 1 else 300


def main():
    # phase 1: accumulate compiled-executable state like a long pytest run
    for i in range(N_WARM):
        n = 8 + (i % 97)

        @jax.jit
        def f(x, i=i):
            y = jnp.sin(x) * (i % 7 + 1) + jnp.sqrt(jnp.abs(x) + 1e-3)
            return jnp.tanh(y @ y.T).sum()

        float(f(jnp.ones((n, n + 1))))
        if i % 100 == 0:
            print(f"warm {i}/{N_WARM}", flush=True)

    # phase 2: the big linearized-scan compile that crashed
    from plutracer_tpu.render.integrator import ray_color
    from plutracer_tpu.ops.camera import generate_rays
    from plutracer_tpu.render.renderer import pixel_centers
    from plutracer_tpu.scene import compile_scene, load_scene_file
    from plutracer_tpu.semantics import DEFAULT_OPTIONS

    d = load_scene_file("/root/reference/scenes/cornell-box.urn",
                        ["/res", "8x8"])
    s = compile_scene(d)
    px0 = pixel_centers(8, 8)
    o, dd = generate_rays(s.camera, jnp.asarray(px0), jnp.asarray(px0) * 0)
    key = jax.random.PRNGKey(11)
    forced = DEFAULT_OPTIONS.replace(
        integrator_backend="pallas", pallas_interpret=True, max_bounces=8
    )

    def loss(mat_color):
        s2 = dataclasses.replace(s, mat_color=mat_color)
        return jnp.mean(ray_color(s2, o, dd, key, forced))

    g = jax.grad(loss)(s.mat_color)
    assert np.isfinite(np.asarray(g)).all()
    print("survived: full-depth megakernel VJP compiled + ran after "
          f"{N_WARM} warm-up programs", flush=True)


if __name__ == "__main__":
    main()

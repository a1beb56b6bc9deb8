"""Measure the streaming megakernel vs the XLA integrator path on TPU.

Amortized timing: `reps` full ray_color evaluations inside one jit
dispatch (the axon relay's per-dispatch latency is 100s of ms and
fluctuates 10x — single-dispatch wall-clock timing is meaningless).

Run: python tools/bench_stream.py [scene] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from plutracer_tpu.ops.camera import generate_rays
from plutracer_tpu.ops.pallas.integrator_kernel import ray_color_pallas
from plutracer_tpu.render.integrator import ray_color
from plutracer_tpu.render.renderer import pixel_centers
from plutracer_tpu.scene import compile_scene, load_scene_file
from plutracer_tpu.semantics import DEFAULT_OPTIONS

XLA = DEFAULT_OPTIONS.replace(integrator_backend="xla")


def main():
    scene_arg = sys.argv[1] if len(sys.argv) > 1 else "scenes/mesh0.urn"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    import pathlib
    p = pathlib.Path(scene_arg)
    if not p.exists():
        p = pathlib.Path("/root/reference/scenes") / f"{scene_arg}.urn"
    W = H = 512
    s = compile_scene(load_scene_file(str(p), ["/res", f"{W}x{H}"]))
    print(f"scene={p.name} P={s.prim_type.shape[0]} "
          f"backend={jax.default_backend()}", flush=True)
    px0 = pixel_centers(W, H)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    px = px0 + jax.random.uniform(k1, px0.shape)
    o, d = generate_rays(s.camera, px, jax.random.uniform(k2, px0.shape))
    B = o.shape[0]
    key = jax.random.PRNGKey(7)

    def make_many(fn):
        @jax.jit
        def many(s, o, d, key):
            def body(i, acc):
                out = fn(s, o, d, jax.random.fold_in(key, i))
                return acc + jnp.sum(out) * 1e-30
            acc = jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
            return fn(s, o + acc, d, key)
        return many

    results = {}
    for name, fn in (
        ("pallas", lambda s, o, d, k: ray_color_pallas(s, o, d, k,
                                                       DEFAULT_OPTIONS)),
        ("xla", lambda s, o, d, k: ray_color(s, o, d, k, XLA)),
    ):
        many = make_many(fn)
        t0 = time.time()
        out = many(s, o, d, key)
        out.block_until_ready()
        compile_s = time.time() - t0
        # the timed call gets DIFFERENT args: identical (executable, args)
        # dispatches can be served from a relay-side cache without running
        t0 = time.time()
        out = many(s, o, d, jax.random.PRNGKey(1234))
        out.block_until_ready()
        wall = time.time() - t0
        dt = wall / (reps + 1)
        out = np.asarray(out)
        results[name] = out
        print(f"{name}: compile={compile_s:.1f}s {dt*1e3:.1f} ms/eval "
              f"({B/dt/1e6:.2f} Msamples/s) finite={np.isfinite(out).all()} "
              f"mean={out.mean():.5f}", flush=True)

    a = np.log1p(np.maximum(results["pallas"], 0))
    b = np.log1p(np.maximum(results["xla"], 0))
    diff = np.abs(a - b)
    print(f"pallas vs xla: outliers>1e-3={(diff > 1e-3).mean():.4%} "
          f"p99={np.quantile(diff, 0.99):.2e} max={diff.max():.2e} "
          f"dlogmean={abs(a.mean() - b.mean()):.2e}", flush=True)


if __name__ == "__main__":
    main()

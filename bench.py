"""Benchmark: cornell-box 512x512 render throughput on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: pixel samples per second (W*H*spp / steady-state render time).
Each sample is a full path: up to 8 shading vertices with NEE, i.e. up to
25 scene-intersection queries per sample.

The reference publishes no numbers (BASELINE.md), so vs_baseline is
measured against this repo's own recorded first-round value in
BASELINE_SELF.json (created on first run).
"""

from __future__ import annotations

import json
import os
import pathlib
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    import plutracer_tpu

    plutracer_tpu.enable_compilation_cache()

    from plutracer_tpu.render.renderer import render_passes, zeros_accum
    from plutracer_tpu.scene import compile_scene, load_scene_file

    w = h = 512
    n = 4  # strata grid per timed pass; throughput is per-sample so any n works
    chunk = 8  # strata per dispatch
    desc = load_scene_file(
        "/root/reference/scenes/cornell-box.urn", ["/res", f"{w}x{h}"]
    )
    scene = compile_scene(desc)
    key = jax.random.PRNGKey(0)

    # warmup/compile; a scalar readback is the only honest sync point
    # through the remote-device relay (block_until_ready returns early).
    # Several warmup passes: the first post-compile executions still pay
    # one-time costs (device cache warm, relay buffers)
    acc = zeros_accum(w, h)
    for wpass in range(2):
        acc = render_passes(
            scene, jax.random.fold_in(key, 100 + wpass), jnp.int32(0), w, h, n,
            chunk, accum=acc,
        )
    float(acc.sum())

    passes = 16
    t0 = time.perf_counter()
    acc = zeros_accum(w, h)
    for s in range(0, passes, chunk):
        acc = render_passes(
            scene, key, jnp.int32(s), w, h, n, chunk, accum=acc
        )
    float(acc.sum())
    dt = time.perf_counter() - t0

    samples = w * h * passes
    sps = samples / dt

    self_path = pathlib.Path(__file__).parent / "BASELINE_SELF.json"
    if self_path.exists():
        base = json.loads(self_path.read_text()).get("samples_per_sec", sps)
    else:
        base = sps
        self_path.write_text(json.dumps({"samples_per_sec": sps, "note": "round-1 self baseline"}))

    print(
        json.dumps(
            {
                "metric": "cornell512_samples_per_sec",
                "value": round(sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(sps / base, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

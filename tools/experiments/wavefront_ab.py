#!/usr/bin/env python
"""A/B the streaming dispatch modes on TPU (honest strata-scan timing).

Modes: mono (monolithic stream kernel), wf-none / wf-compact / wf-morton
(origin sort, r4) / wf-morton5 (r5: direction-octant-major sort so each
(32,128) tile shares a direction cone and the per-chunk cluster cull can
reject the half-space behind it).

Usage: python tools/experiments/wavefront_ab.py [scene ...] [--res 256]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

import plutracer_tpu
from plutracer_tpu.render.renderer import render_passes, zeros_accum
from plutracer_tpu.scene import compile_scene, load_scene_file
from plutracer_tpu.semantics import DEFAULT_OPTIONS

SCN = "/root/reference/scenes"

MODES = {
    "mono": DEFAULT_OPTIONS,
    "wf-none": DEFAULT_OPTIONS.replace(stream_wavefront=True, stream_sort="none"),
    "wf-morton": DEFAULT_OPTIONS.replace(stream_wavefront=True, stream_sort="morton"),
    "wf-morton5": DEFAULT_OPTIONS.replace(stream_wavefront=True, stream_sort="morton5"),
}


def measure(scene, w, h, options, passes=16, chunk=8, n=4):
    key = jax.random.PRNGKey(0)
    acc = zeros_accum(w, h)
    for wp in range(2):
        acc = render_passes(scene, jax.random.fold_in(key, 100 + wp),
                            jnp.int32(0), w, h, n, chunk, options, accum=acc)
    float(acc.sum())
    t0 = time.perf_counter()
    acc = zeros_accum(w, h)
    for s in range(0, passes, chunk):
        acc = render_passes(scene, key, jnp.int32(s), w, h, n, chunk,
                            options, accum=acc)
    float(acc.sum())
    dt = time.perf_counter() - t0
    sps = w * h * passes / dt
    return sps, bool(np.isfinite(np.asarray(acc)).all())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*",
                    default=["test1", "repo-mesh0", "repo-mesh1"])
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--modes", default="mono,wf-none,wf-morton,wf-morton5")
    args = ap.parse_args()
    plutracer_tpu.enable_compilation_cache()

    for name in args.scenes:
        path = (f"scenes/{name[5:]}.urn" if name.startswith("repo-")
                else f"{SCN}/{name}.urn")
        desc = load_scene_file(str(Path("/root/repo") / path)
                               if not path.startswith("/") else path,
                               ["/res", f"{args.res}x{args.res}"])
        scene = compile_scene(desc)
        P = scene.prim_type.shape[0]
        for mode in args.modes.split(","):
            t0 = time.time()
            sps, ok = measure(scene, args.res, args.res, MODES[mode])
            print(f"{name:12s} P={P:6d} {mode:10s} {sps/1e6:8.2f} M samples/s"
                  f" finite={ok} (wall incl compile {time.time()-t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()

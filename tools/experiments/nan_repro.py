#!/usr/bin/env python
"""Reproduce + measure the TPU scan-backward nonfinite gradients.

Runs the flagship-shaped train step (cornell, ab loss, pooled) for a few
steps and prints the per-step nonfinite_grad_frac. On TPU before the r5
safe-derivative fix this printed ~0.4-0.8; the fix targets 0.0 exactly.

Usage: python tools/experiments/nan_repro.py [--res 256] [--steps 8]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import numpy as np

from plutracer_tpu.parallel.mesh import make_mesh
from plutracer_tpu.parallel.sharded import get_params, make_train_step
from plutracer_tpu.render.renderer import render
from plutracer_tpu.scene import compile_scene, load_scene_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--loss", default="ab")
    ap.add_argument("--downsample", type=int, default=8)
    args = ap.parse_args()

    d = load_scene_file("/root/reference/scenes/cornell-box.urn",
                        ["/res", f"{args.res}x{args.res}"])
    s = compile_scene(d)
    print(f"backend={jax.default_backend()} res={args.res}")
    tgt = np.asarray(render(s, args.res, args.res, 4, jax.random.PRNGKey(1)))
    mesh = make_mesh()
    step = make_train_step(
        s, args.res, args.res, args.n, mesh,
        loss_space=args.loss, trainable=("mat_color", "light_intensity"),
        project_nonnegative=True, loss_downsample=args.downsample,
    )
    params = get_params(s)
    # perturb so gradients are non-trivial
    params = {k: v * 0.7 + 0.05 for k, v in params.items()}
    opt_state = step.init(params)
    t0 = time.time()
    params, opt_state, losses, nf = step.many(
        params, opt_state, tgt.reshape(-1, 3), jax.random.PRNGKey(3),
        0, args.steps,
    )
    nf = np.asarray(nf, np.float64)
    losses = np.asarray(losses, np.float64)
    print(f"steps={args.steps} wall={time.time()-t0:.1f}s")
    print("losses:", np.array2string(losses, precision=4))
    print("nf_frac:", np.array2string(nf, precision=4))
    print(f"nf mean={nf.mean():.4f} max={nf.max():.4f} "
          f"frac_steps_rejected={(nf > 0).mean():.3f}")


if __name__ == "__main__":
    main()

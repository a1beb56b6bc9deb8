"""Progressive, checkpointable rendering.

The reference has no checkpoint/resume at all (SURVEY §5); partial renders
die with the process. Here the sample accumulator + pass counter + seed are
serialized after every stratified pass, so an interrupted render resumes
exactly (the RNG is counter-based: pass s always uses fold_in(key, s)).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from plutracer_tpu.render.renderer import render_pass
from plutracer_tpu.semantics import DEFAULT_OPTIONS, RenderOptions


def save_state(path: str, accum, next_pass: int, seed: int) -> None:
    tmp = path + ".tmp"
    np.savez(tmp, accum=np.asarray(accum), next_pass=next_pass, seed=seed)
    os.replace(tmp + ".npz", path)


def load_state(path: str):
    z = np.load(path)
    return jnp.asarray(z["accum"]), int(z["next_pass"]), int(z["seed"])


def render_with_checkpoint(
    scene,
    width: int,
    height: int,
    n: int,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 8,
    options: RenderOptions = DEFAULT_OPTIONS,
):
    """Render n^2 stratified passes; optionally resume from / write to a
    checkpoint file. Returns the linear (H, W, 3) image."""
    spp = n * n
    key = jax.random.PRNGKey(seed)
    accum = jnp.zeros((height * width, 3))
    start = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        accum, start, ck_seed = load_state(checkpoint_path)
        if ck_seed != seed:
            raise ValueError(
                f"checkpoint seed {ck_seed} != requested seed {seed}"
            )
        print(f"resuming at pass {start}/{spp}")
    for s in range(start, spp):
        k = jax.random.fold_in(key, s)
        accum = accum + render_pass(
            scene, k, jnp.int32(s), width, height, n, options
        )
        if checkpoint_path and ((s + 1) % checkpoint_every == 0 or s + 1 == spp):
            accum.block_until_ready()
            save_state(checkpoint_path, accum, s + 1, seed)
    return (accum / spp).reshape(height, width, 3)

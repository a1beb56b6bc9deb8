"""Inverse rendering: fit scene parameters to a target image.

The BASELINE "cornell-box inverse rendering" config: optimize material
albedo + light emission from a target image, sharded over a device mesh.
Gradients flow through the full path-tracing estimator (NEE + MIS + bounce
scan); per-pass stochasticity acts as minibatch noise for the optimizer.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from plutracer_tpu.parallel.mesh import make_mesh
from plutracer_tpu.parallel.sharded import (
    apply_params,
    get_params,
    make_train_step,
)
from plutracer_tpu.semantics import DEFAULT_OPTIONS, RenderOptions


@dataclasses.dataclass
class InverseRenderConfig:
    width: int = 128
    height: int = 128
    n: int = 2  # stratified grid per step (spp = n^2 per estimator pass)
    steps: int = 200
    learning_rate: float = 5e-3
    seed: int = 0
    mesh_shape: Optional[tuple] = None  # default: all devices on `tiles`
    log_every: int = 20
    options: RenderOptions = DEFAULT_OPTIONS
    loss_space: str = "ab"
    trainable: tuple = ("mat_color", "light_intensity", "tex_c0", "tex_c1")
    # project parameters to be nonnegative after each update (albedo,
    # emission, and texture colors are physically >= 0)
    project_nonnegative: bool = True
    # optional optax optimizer (overrides the default adam(learning_rate));
    # use e.g. optax.multi_transform for per-field learning rates when the
    # parameter scales differ by orders of magnitude (emission ~500 vs
    # albedo ~0.2)
    optimizer: Optional[object] = None
    # optional per-entry 0/1 gradient mask (see make_train_step)
    grad_mask: Optional[Dict] = None
    # k x k average-pool rendered/target images before the ab loss
    # (unbiased variance reduction; see make_train_step)
    loss_downsample: int = 1
    # firefly clamp: bound both rendered and target linear radiance
    # before the loss (bounded-influence estimator; see make_train_step)
    loss_clamp: float = 0.0


def optimize_scene(
    scene,
    target_linear,
    config: InverseRenderConfig = InverseRenderConfig(),
    init_params: Optional[Dict] = None,
    callback: Optional[Callable[[int, float, Dict], None]] = None,
    stats_out: Optional[Dict] = None,
):
    """Run the inverse-rendering loop.

    target_linear: (H, W, 3) linear-radiance target image.
    Returns (params, losses). If stats_out is a dict, records
    'nonfinite_grad_frac_mean'/'_max' — the fraction of gradient entries
    sanitized per step (should be 0; nonzero means the backward emitted
    NaN/Inf lanes that nan_to_num zeroed — see sharded.shard_loss_grad).
    """
    import optax

    mesh = make_mesh(config.mesh_shape)
    opt = config.optimizer or optax.adam(config.learning_rate)
    step = make_train_step(
        scene, config.width, config.height, config.n, mesh, optimizer=opt,
        options=config.options, loss_space=config.loss_space,
        trainable=config.trainable, grad_mask=config.grad_mask,
        project_nonnegative=config.project_nonnegative,
        loss_downsample=config.loss_downsample,
        loss_clamp=config.loss_clamp,
    )
    params = init_params if init_params is not None else get_params(scene)
    opt_state = step.init(params)
    target_flat = jnp.asarray(np.asarray(target_linear).reshape(-1, 3))
    key = jax.random.PRNGKey(config.seed)
    losses: List[float] = []
    # chunked: log_every optimization steps per device dispatch (lax.scan
    # inside the jit — see make_train_step.many). The per-step host loop
    # used to cost one dispatch + one scalar sync + 4 eager projection ops
    # per step, which through the axon relay dominated training wall-clock.
    chunk = max(1, config.log_every)
    nf_fracs: List[float] = []
    i = 0
    while i < config.steps:
        # first chunk is a single step so the callback cadence matches the
        # historical per-step loop (fires at steps 0, log_every, 2*log_every
        # ..., last)
        k = 1 if i == 0 else min(chunk, config.steps - i)
        params, opt_state, loss_k, nf_k = step.many(
            params, opt_state, target_flat, key, i, k
        )
        losses.extend(np.asarray(loss_k, np.float64).tolist())
        nf_fracs.extend(np.asarray(nf_k, np.float64).tolist())
        if callback:
            callback(i + k - 1, losses[-1], params)
        i += k
    if stats_out is not None:
        # steps == 0 is degenerate-but-legal: report 0.0, not np.mean([])
        stats_out["nonfinite_grad_frac_mean"] = (
            float(np.mean(nf_fracs)) if nf_fracs else 0.0
        )
        stats_out["nonfinite_grad_frac_max"] = (
            float(np.max(nf_fracs)) if nf_fracs else 0.0
        )
    return params, losses

"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("tiles", "spp"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2D (tiles, spp) mesh over the available devices.

    Default shape puts all devices on the `tiles` axis (pure ray-data
    parallelism); pass e.g. (4, 2) to also parallelize sample passes.
    """
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devs), 1)
    n = shape[0] * shape[1]
    if n > len(devs):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devs)}")
    arr = np.array(devs[:n]).reshape(shape)
    return Mesh(arr, axis_names)


def initialize_distributed(coordinator: Optional[str] = None, **kw) -> None:
    """Multi-host bring-up: call once per process before device queries.

    Thin wrapper over jax.distributed.initialize; on single-host it's a
    no-op if initialization fails because there is no cluster.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator, **kw)
    except (ValueError, RuntimeError):
        if coordinator is not None:
            raise

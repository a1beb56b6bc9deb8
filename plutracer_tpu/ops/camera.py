"""Camera ray generation (reference: inc/camera.h:25-37).

Batched: px (B,2) pixel-space sample positions -> ray origins/directions.
NDC spans [-1,1]^2 on both axes with a y flip and NO aspect compensation;
the film plane sits at distance w=2.5 along `look` with the 1.5-scaled
right/up basis. Thin-lens depth of field refocuses through the plane at
focal_distance measured along *world z* (the reference divides by d.z).
"""

from __future__ import annotations

import jax.numpy as jnp

from plutracer_tpu.ops.sampling import concentric_disk_sample
from plutracer_tpu.scene.types import CameraParams


def generate_rays(cam: CameraParams, px, lens_u):
    """px: (B,2) sample positions in pixels; lens_u: (B,2) in [0,1)^2.

    Returns (o, d): (B,3) each.
    """
    uv = px * cam.inv_image_size * 2.0 - 1.0
    uv = uv * jnp.array([1.0, -1.0])
    d = (
        cam.w * cam.look
        + uv[..., 0:1] * cam.right
        + uv[..., 1:2] * cam.up
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam.pos, d.shape)

    def with_lens(o, d):
        l = concentric_disk_sample(lens_u) * cam.lens_radius
        pof = o + d * (cam.focal_distance / d[..., 2:3])
        o2 = o + jnp.concatenate([l, jnp.zeros_like(l[..., :1])], -1)
        d2 = pof - o2
        d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
        return o2, d2

    o2, d2 = with_lens(o, d)
    use_lens = cam.lens_radius > 0.0
    o = jnp.where(use_lens, o2, o)
    d = jnp.where(use_lens, d2, d)
    return o, d

"""Sampling distributions and stratified sample generation.

Ports of the reference's rnd:: distributions (inc/cmmn.h:239-299) driven by
counter-based `jax.random` keys instead of the reference's shared, unlocked
global mt19937 — renders become deterministic and race-free, and every
sample's randomness is reproducible from (pixel, sample, bounce) alone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def concentric_disk_sample(u):
    """Concentric square->disk map (inc/cmmn.h:252-270). u: (...,2) in [0,1)."""
    u = 2.0 * u - 1.0
    ux, uy = u[..., 0], u[..., 1]
    zero = (ux == 0.0) & (uy == 0.0)

    # region selection per the reference's nested conditionals
    cond_a = ux >= -uy
    cond_b = ux > uy
    cond_c = ux <= uy

    safe = lambda x: jnp.where(x == 0.0, 1.0, x)
    r_a1 = ux
    phi_a1 = jnp.where(uy > 0.0, uy / safe(ux), 8.0 + uy / safe(ux))
    r_a2 = uy
    phi_a2 = 2.0 - ux / safe(uy)
    r_b1 = -ux
    phi_b1 = 4.0 - uy / safe(ux)
    r_b2 = -uy
    phi_b2 = 6.0 - ux / safe(uy)

    r = jnp.where(cond_a, jnp.where(cond_b, r_a1, r_a2), jnp.where(cond_c, r_b1, r_b2))
    phi = jnp.where(
        cond_a, jnp.where(cond_b, phi_a1, phi_a2), jnp.where(cond_c, phi_b1, phi_b2)
    )
    phi = phi * (jnp.pi * 0.25)
    out = jnp.stack([jnp.cos(phi), jnp.sin(phi)], -1) * r[..., None]
    return jnp.where(zero[..., None], 0.0, out)


def uniform_hemisphere_sample(u):
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[..., 0] ** 2))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), u[..., 0]], -1)


def uniform_hemisphere_pdf():
    return 1.0 / (2.0 * jnp.pi)


def uniform_sphere_sample(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def uniform_sphere_pdf():
    return 1.0 / (4.0 * jnp.pi)


def cosine_hemisphere_sample(u):
    d = concentric_disk_sample(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.sum(d * d, -1)))
    return jnp.concatenate([d, z[..., None]], -1)


def cosine_hemisphere_pdf(costheta):
    return costheta / jnp.pi


def stratified_offsets(key, n: int, jitter: bool = True):
    """(n*n, 2) stratified offsets in [0,1)^2: (cell + jitter*0.999)/n.

    Matches samplers::stratified_sample_2d (inc/sampler.h:44-50), including
    the 0.999 jitter shrink; jitter=False centers at 0.5.
    """
    ix = jnp.arange(n * n, dtype=jnp.float32)
    cx = ix % n
    cy = ix // n
    cell = jnp.stack([cx, cy], -1)
    if jitter:
        j = jax.random.uniform(key, (n * n, 2)) * 0.999
    else:
        j = jnp.full((n * n, 2), 0.5)
    return (cell + j) / n

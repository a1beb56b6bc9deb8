"""Math-core utilities: rays and axis-aligned bounding boxes.

Batched ports of the reference's plu::ray / plu::aabb toolkit
(inc/cmmn.h:40-216). The renderer's hot path inlines what it needs
(ops/intersect.py); these standalone versions complete the public API —
transforms, containment, union, ray-interval queries — for tooling, BVH
construction, and user code.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


def ray_at(o, d, t):
    """Position along the ray: o + d*t (cmmn.h:48-51)."""
    return o + d * jnp.asarray(t)[..., None]


def ray_transform(o, d, m):
    """Transform a ray by a 4x4 matrix: origin as a point, direction as a
    vector (cmmn.h:54-57)."""
    o2 = (m[:3, :3] @ o[..., None])[..., 0] + m[:3, 3]
    d2 = (m[:3, :3] @ d[..., None])[..., 0]
    return o2, d2


class Aabb(NamedTuple):
    lo: jnp.ndarray  # (...,3)
    hi: jnp.ndarray  # (...,3)

    @staticmethod
    def empty():
        return Aabb(jnp.zeros(3), jnp.zeros(3))

    def add_point(self, p) -> "Aabb":
        return Aabb(jnp.minimum(self.lo, p), jnp.maximum(self.hi, p))

    def union(self, other: "Aabb") -> "Aabb":
        """aabb(a, b) union constructor (cmmn.h:77-84)."""
        return Aabb(jnp.minimum(self.lo, other.lo), jnp.maximum(self.hi, other.hi))

    def contains(self, p):
        """Inclusive containment (cmmn.h:97-104)."""
        return jnp.all((p >= self.lo) & (p <= self.hi), axis=-1)

    def inside_of(self, other: "Aabb"):
        """Any of this box's 8 corners inside `other` (cmmn.h:108-121)."""
        lo, hi = self.lo, self.hi
        corners = jnp.stack(
            [
                jnp.stack([jnp.where(m & (1 << k), hi[..., k], lo[..., k]) for k in range(3)], -1)
                for m in range(8)
            ],
            axis=-2,
        )
        return jnp.any(other.contains(corners), axis=-1)

    def transform(self, m) -> "Aabb":
        """Arvo-style AABB transform by a 4x4 matrix (cmmn.h:125-146)."""
        t = m[:3, 3]
        r = m[:3, :3]
        lo = t + jnp.minimum(r * self.lo[..., None, :], r * self.hi[..., None, :]).sum(-1)
        hi = t + jnp.maximum(r * self.lo[..., None, :], r * self.hi[..., None, :]).sum(-1)
        return Aabb(lo, hi)

    def hit(self, o, d):
        """Slab test: tmax >= tmin (cmmn.h:150-170; no positivity check)."""
        tmin, tmax = self.hit_retint(o, d)
        return tmax >= tmin

    def hit_retint(self, o, d) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """The (tmin, tmax) interval on the ray inside the box
        (cmmn.h:173-190)."""
        rrd = 1.0 / jnp.where(d == 0.0, 1e-20, d)
        t1 = (self.lo - o) * rrd
        t2 = (self.hi - o) * rrd
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        return tmin, tmax

    def center(self):
        return (self.lo + self.hi) * 0.5

    def extents(self):
        return self.hi - self.lo

    def surface_area(self):
        d = self.extents()
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2] + d[..., 1] * d[..., 2])

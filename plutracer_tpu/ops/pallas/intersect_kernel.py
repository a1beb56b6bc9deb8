"""Pallas closest-hit kernel: fused brute-force ray-scene intersection.

The XLA path (ops/intersect.py) materializes a (B, P) t-matrix in HBM and
runs dozens of small elementwise kernels. This kernel keeps everything in
VMEM: each program owns a (32, 128) tile of 4096 rays, streams the
primitive table through in chunks of 8 rows, and folds a running
(best_t, best_prim) minimum — one kernel, no HBM intermediates.

Layouts (TPU tiling: sublane x lane = (8k, 128)):
- ray components ox..dz: (B/128, 128) f32, block (32, 128)
- primitive table: (P, 24) f32 rows [type ax ay az bx by bz cx cy cz id
  pmin0..2 pmax0..2 0...], block (8, 24); the j grid axis walks primitive
  chunks; cols 11:17 hold the sphere rows' parent-AABB cull box
- outputs best_t (f32) and best_prim (i32): (B/128, 128), block (32, 128),
  revisited across j (accumulator pattern)

Same accept rules as ops/intersect.py (sphere both-roots>0, box tmin>=0,
triangle Moller-Trumbore t>0), so results match the XLA path exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from plutracer_tpu.ops.intersect import T_MAX, _BIG
from plutracer_tpu.scene.types import PRIM_BOX, PRIM_SPHERE, PRIM_TRIANGLE

RAY_TILE = 4096  # rays per program: (32, 128)
PRIM_TILE = 8  # primitive rows per inner step


def _kernel(prims_ref, ox, oy, oz, dx, dy, dz, t_ref, p_ref):
    import jax.experimental.pallas as pl

    jprog = pl.program_id(1)

    @pl.when(jprog == 0)
    def _():
        t_ref[:, :] = jnp.full(t_ref.shape, _BIG, jnp.float32)
        p_ref[:, :] = jnp.zeros(p_ref.shape, jnp.int32)

    o_x, o_y, o_z = ox[:, :], oy[:, :], oz[:, :]
    d_x, d_y, d_z = dx[:, :], dy[:, :], dz[:, :]

    # pack_prims_np partitions the table by type, so every row of this
    # chunk shares prims_ref[0, 0]; predicating the three intersectors on
    # that scalar runs exactly ONE of them per chunk — 3x less VPU work
    # than compute-all-and-select (this kernel is compute-bound at ~3
    # TFLOP/s, so the win is real; measured 16.3 -> ~6 ms at P=1283).
    chunk_type = prims_ref[0, 0]

    def folder():
        """Accumulate (best_t, best_p) in registers; one VMEM write at end."""
        state = [t_ref[:, :], p_ref[:, :]]

        def fold(k, t_k):
            prim_idx = prims_ref[k, 10].astype(jnp.int32)  # original scene row
            better = t_k < state[0]
            state[0] = jnp.where(better, t_k, state[0])
            state[1] = jnp.where(better, prim_idx, state[1])

        def flush():
            t_ref[:, :] = state[0]
            p_ref[:, :] = state[1]

        return fold, flush

    @pl.when(chunk_type == PRIM_SPHERE)
    def _():
        fold, flush = folder()
        # reference bvh internal-node phantom-hit cull: sphere rows carry
        # their leaf's parent AABB in cols 11:17 (pack_prims_np /
        # ops.bvh.parent_bounds_tables); a row only competes when the ray
        # LINE crosses that box (aabb::hit, inc/cmmn.h:150-172) — exactly
        # the reference traversal's reach condition, collapsed by nesting.
        rx = 1.0 / jnp.where(d_x == 0.0, 1e-20, d_x)
        ry = 1.0 / jnp.where(d_y == 0.0, 1e-20, d_y)
        rz = 1.0 / jnp.where(d_z == 0.0, 1e-20, d_z)
        for k in range(PRIM_TILE):
            ax, ay, az = prims_ref[k, 1], prims_ref[k, 2], prims_ref[k, 3]
            r = prims_ref[k, 4]
            vx, vy, vz = o_x - ax, o_y - ay, o_z - az
            qb = -(vx * d_x + vy * d_y + vz * d_z)
            det = qb * qb - (vx * vx + vy * vy + vz * vz) + r * r
            sq = jnp.sqrt(jnp.maximum(det, 0.0))
            i1 = qb - sq
            i2 = qb + sq
            t1x, t2x = (prims_ref[k, 11] - o_x) * rx, (prims_ref[k, 14] - o_x) * rx
            t1y, t2y = (prims_ref[k, 12] - o_y) * ry, (prims_ref[k, 15] - o_y) * ry
            t1z, t2z = (prims_ref[k, 13] - o_z) * rz, (prims_ref[k, 16] - o_z) * rz
            pmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            pmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            ok = (det >= 0.0) & (i1 > 0.0) & (i2 > 0.0) & (pmax >= pmin)
            fold(k, jnp.where(ok, i1, _BIG))
        flush()

    @pl.when(chunk_type == PRIM_BOX)
    def _():
        fold, flush = folder()
        rx = 1.0 / jnp.where(d_x == 0.0, 1e-20, d_x)
        ry = 1.0 / jnp.where(d_y == 0.0, 1e-20, d_y)
        rz = 1.0 / jnp.where(d_z == 0.0, 1e-20, d_z)
        for k in range(PRIM_TILE):
            ax, ay, az = prims_ref[k, 1], prims_ref[k, 2], prims_ref[k, 3]
            bx, by, bz = prims_ref[k, 4], prims_ref[k, 5], prims_ref[k, 6]
            t1x, t2x = (ax - o_x) * rx, (bx - o_x) * rx
            t1y, t2y = (ay - o_y) * ry, (by - o_y) * ry
            t1z, t2z = (az - o_z) * rz, (bz - o_z) * rz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            fold(k, jnp.where((tmax >= tmin) & (tmin >= 0.0), tmin, _BIG))
        flush()

    @pl.when(chunk_type == PRIM_TRIANGLE)
    def _():
        fold, flush = folder()
        for k in range(PRIM_TILE):
            ax, ay, az = prims_ref[k, 1], prims_ref[k, 2], prims_ref[k, 3]
            bx, by, bz = prims_ref[k, 4], prims_ref[k, 5], prims_ref[k, 6]
            cx, cy, cz = prims_ref[k, 7], prims_ref[k, 8], prims_ref[k, 9]
            e1x, e1y, e1z = bx - ax, by - ay, bz - az
            e2x, e2y, e2z = cx - ax, cy - ay, cz - az
            pvx = d_y * e2z - d_z * e2y
            pvy = d_z * e2x - d_x * e2z
            pvz = d_x * e2y - d_y * e2x
            det_t = e1x * pvx + e1y * pvy + e1z * pvz
            idet = 1.0 / jnp.where(det_t == 0.0, 1.0, det_t)
            tvx, tvy, tvz = o_x - ax, o_y - ay, o_z - az
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * idet
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (d_x * qvx + d_y * qvy + d_z * qvz) * idet
            t_tr = (e2x * qvx + e2y * qvy + e2z * qvz) * idet
            ok_t = (
                (det_t != 0.0)
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t_tr > 0.0)
            )
            fold(k, jnp.where(ok_t, t_tr, _BIG))
        flush()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_closest(prims_packed, ox, oy, oz, dx, dy, dz, interpret=False):
    import jax.experimental.pallas as pl

    Bs = ox.shape[0]  # rows of 128 rays
    P = prims_packed.shape[0]
    grid = (Bs // 32, P // PRIM_TILE)

    ray_spec = pl.BlockSpec((32, 128), lambda i, j: (i, 0))
    out_specs = [
        pl.BlockSpec((32, 128), lambda i, j: (i, 0)),
        pl.BlockSpec((32, 128), lambda i, j: (i, 0)),
    ]
    prim_spec = pl.BlockSpec((PRIM_TILE, 24), lambda i, j: (j, 0))

    t, p = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[prim_spec] + [ray_spec] * 6,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((Bs, 128), jnp.float32),
            jax.ShapeDtypeStruct((Bs, 128), jnp.int32),
        ],
        interpret=interpret,
    )(prims_packed, ox, oy, oz, dx, dy, dz)
    return t, p


def pack_prims_np(scene) -> np.ndarray:
    """(P_pad, 24) f32 primitive table for the Pallas kernel, PARTITIONED
    BY PRIMITIVE TYPE: all spheres, then boxes, then triangles, each
    segment padded to a PRIM_TILE multiple with never-hit rows of the same
    type (sphere: r=0 at 1e30; box: min > max; triangle: all-zero verts).
    Column 10 carries the ORIGINAL scene row index, which the kernel
    reports as the winner — so results are identical to the unsorted
    brute-force query. Sphere rows carry their BVH leaf's parent AABB in
    cols 11:17 (always-hit +-3e38 when absent) for the reference's
    internal-node phantom-hit cull (ops.bvh.parent_bounds_tables). The
    partition lets the kernel run exactly one type-specialized intersector
    per chunk (see _kernel). Pure numpy — runs at scene-compile time with
    zero device round-trips."""
    ptype = np.asarray(scene.prim_type, np.int32)
    pa = np.asarray(scene.prim_a, np.float32)
    pb = np.asarray(scene.prim_b, np.float32)
    pc = np.asarray(scene.prim_c, np.float32)
    pmin = getattr(scene, "parent_min", None)
    pmax = getattr(scene, "parent_max", None)
    cull = set(getattr(scene, "cull_rows", None) or ())

    segments = []
    for t in (PRIM_SPHERE, PRIM_BOX, PRIM_TRIANGLE):
        (idx,) = np.nonzero(ptype == t)
        if idx.size == 0:
            continue
        n_pad = -(-idx.size // PRIM_TILE) * PRIM_TILE
        seg = np.zeros((n_pad, 24), np.float32)
        seg[:, 0] = t
        seg[:, 11:14] = -3.0e38  # parent-AABB cull default: always hit
        seg[:, 14:17] = 3.0e38
        seg[: idx.size, 1:4] = pa[idx]
        seg[: idx.size, 4:7] = pb[idx]
        seg[: idx.size, 7:10] = pc[idx]
        seg[: idx.size, 10] = idx.astype(np.float32)
        if t == PRIM_SPHERE and pmin is not None:
            for i, j in enumerate(idx):
                if int(j) in cull:
                    seg[i, 11:14] = np.asarray(pmin)[j]
                    seg[i, 14:17] = np.asarray(pmax)[j]
        # never-winning padding per type. NOTE an "inverted" box (min > max)
        # is NOT a miss — the slab test re-sorts t1/t2 per axis — so padding
        # shapes are instead placed ~1e30 away: any hit has t >> T_MAX and
        # loses the running min to every real hit (and reports found=False
        # when nothing real hits, same as the XLA argmin-of-misses path).
        if t == PRIM_SPHERE:
            seg[idx.size :, 1] = 1.0e30  # far center, r=0 -> det NaN/neg -> miss
        elif t == PRIM_BOX:
            seg[idx.size :, 1:4] = 1.0e30
            seg[idx.size :, 4:7] = 2.0e30
        # triangles: all-zero vertices -> det == 0 -> reject
        seg[idx.size :, 10] = 0.0  # clamp padding winners to row 0 (never win)
        segments.append(seg)
    if not segments:
        seg = np.zeros((PRIM_TILE, 24), np.float32)
        seg[:, 0] = PRIM_TRIANGLE
        segments.append(seg)
    return np.concatenate(segments, axis=0)


def pack_prims(scene) -> jnp.ndarray:
    """Device-array variant of pack_prims_np (np.asarray pulls device
    leaves to host; callers outside compile_scene are tests/tools)."""
    return jnp.asarray(pack_prims_np(scene))


def intersect_lite_pallas(scene, o, d, prims_packed=None, interpret=False):
    """Drop-in for ops.intersect.intersect_lite on TPU. o, d: (B, 3)."""
    if prims_packed is None:
        prims_packed = pack_prims(scene)
    B = o.shape[0]
    B_pad = -(-B // RAY_TILE) * RAY_TILE
    pad = B_pad - B

    def comp(x):
        x = jnp.pad(x, (0, pad))
        return x.reshape(B_pad // 128, 128)

    ox, oy, oz = comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2])
    # padded rays get d = (0,0,1): box_t guards /0, results discarded
    dpad = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    dx = dpad[:, 0].reshape(B_pad // 128, 128)
    dy = dpad[:, 1].reshape(B_pad // 128, 128)
    dz = dpad[:, 2].reshape(B_pad // 128, 128)

    t, p = _pallas_closest(prims_packed, ox, oy, oz, dx, dy, dz, interpret=interpret)
    t = t.reshape(-1)[:B]
    p = p.reshape(-1)[:B]
    return t < T_MAX, p, t

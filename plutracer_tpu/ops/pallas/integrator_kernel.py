"""Pallas integrator megakernel: the ENTIRE bounce loop in one TPU program.

Why: the XLA integrator is HBM-bandwidth-bound at XLA's fusion granularity
(PERF.md roofline: ~900 elementwise kernels per bounce, each streaming its
(B,) operands through HBM at ~2.6 us — 85% of render time, ~16 GB of
traffic per stratum at B=262k). This kernel keeps every per-ray quantity in
VMEM/registers across ALL bounces: HBM traffic collapses to reading the
primary rays + uniforms once and writing the radiance once.

Semantics: a line-for-line port of render/integrator.py::ray_color (which
itself matches the reference src/renderer.cpp:59-96 — same citations apply)
operating on component-separated (32, 128) ray tiles. The caller passes in
the SAME jax.random uniforms the XLA path would draw (u = uniform(fold_in
(key, bounce), (B, 12))), so the two paths make identical sampling
decisions and agree per-sample up to float32 reassociation (the dielectric
knife edge, sphere.cpp:21-23, can still flip isolated lanes).

Scope (static, from scene SHAPES — see `megakernel_eligible`): two tiers
by primitive count — scenes up to MAX_P use the fully-UNROLLED kernel
(every table row preloaded as scalars; fastest, but program size and
Mosaic compile time are O(P)); larger scenes up to MAX_P_STREAM use the
STREAMING kernel (`_build_kernel_stream`: fori_loop over Morton-ordered
MegaPack chunks, program size O(1) in P). MAX_M materials / MAX_T
textures / MAX_L lights stay select-chain sized, and image textures are
excluded (a per-ray atlas gather has no efficient VMEM lowering). Scenes
beyond the gates render through the XLA path unchanged.

Layout: rays are (B/128, 128) f32 per component, block (32, 128) = 4096
rays per program; entity tables ride along whole (ops.tables layouts);
uniforms are (max_bounces*12, B/128, 128) sliced per bounce inside a
lax.fori_loop (compiles the bounce body once instead of 8 times).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from plutracer_tpu.ops.intersect import T_MAX, _BIG
from plutracer_tpu.scene.types import (
    LIGHT_POINT,
    MAT_DIFFUSE,
    MAT_GLASS,
    MAT_MIRROR,
    MAT_REFRACT,
    PRIM_BOX,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
    TEX_CHECKERBOARD,
)

RAY_TILE = 4096  # rays per program: (32, 128)
TILE = (32, 128)

# static eligibility caps. Scenes with at most MAX_P primitives use the
# fully-unrolled kernel (every table row preloaded as scalars, closest-hit
# unrolled); scenes up to MAX_P_STREAM use the STREAMING kernel (fori_loop
# over Morton-ordered chunks with cluster-AABB whole-tile culling — program
# size O(1) in P, table VMEM ~P*128*4 B). M/T/L stay select-chain sized.
MAX_P = 64
MAX_P_STREAM = 40960
# HBM tier (r5): MegaPack tables with at least HBM_MIN_ROWS rows stay in
# HBM (memory_space=ANY) and are walked through a double-buffered
# SLAB_ROWS-row VMEM scratch via async DMA — P is no longer bounded by
# VMEM. Tables below the threshold keep the r3/r4 all-VMEM fast path.
# The threshold is a module global so tests can force tiny tables onto
# the HBM path (tests/test_megakernel.py).
SLAB_ROWS = 1024
HBM_MIN_ROWS = 24576
MAX_P_HBM = 1 << 20
MAX_ATLAS = 4096  # image-atlas texels the unrolled kernel will VMEM-pin
MAX_M = 16
MAX_T = 8
MAX_L = 8

INV_PI = 1.0 / 3.14159265358979323846
PI = 3.14159265358979323846


def _vmem_rows_ok(mega) -> bool:
    """VMEM-resident MegaPack rows (tables below the HBM threshold) must
    fit the r3/r4 all-VMEM budget; HBM-tier tables are unbounded by it."""
    rows = [t.shape[0] for t in (mega.sph, mega.box, mega.tri)]
    return sum(r for r in rows if r < HBM_MIN_ROWS) <= MAX_P_STREAM


def megakernel_eligible(scene, options) -> bool:
    """Static qualification (shapes only — safe under jit tracing)."""
    A = scene.atlas.shape[0]
    P = scene.prim_type.shape[0]
    mega = getattr(scene, "prims_mega", None)
    return (
        getattr(scene, "prims_packed", None) is not None
        and (P <= MAX_P or mega is not None)
        and (P <= MAX_P_STREAM or (mega is not None and _vmem_rows_ok(mega)))
        and P <= MAX_P_HBM
        and scene.mat_type.shape[0] <= MAX_M
        and scene.tex_type.shape[0] <= MAX_T
        and 1 <= scene.light_type.shape[0] <= MAX_L
        # image textures: VMEM-pinned atlas fetch, gated on atlas SIZE
        # only (r4 — the lane-gather loop costs ~4 VPU ops per 128-texel
        # row per bounce; r5 extends the atlas path to the streaming and
        # HBM tiers, so P no longer matters here)
        and (A <= 1 or A <= MAX_ATLAS)
        and getattr(options, "dtype", "float32") == "float32"
    )


# ---------------------------------------------------------------------------
# streaming-kernel packing (numpy, runs once at scene-compile time)
# ---------------------------------------------------------------------------

PCHUNK = 8  # primitive rows per streamed chunk (= f32 sublane tile)


def _morton3(x: "np.ndarray") -> "np.ndarray":
    """30-bit Morton codes for (N, 3) points normalized to [0, 1)."""
    import numpy as np

    q = np.clip((x * 1024.0).astype(np.int64), 0, 1023)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


MEGA_W = 40  # 0:28 = tables.pack_tables prim layout; 32:35 cluster AABB
# min, 35:38 cluster AABB max (per-chunk, duplicated into every row of the
# chunk so ONE aligned (PCHUNK, MEGA_W) load serves both cull and
# intersection). VMEM pads the lane dim to 128 regardless, so the extra
# width is free.


def pack_mega_np(scene):
    """Build the MegaPack (see scene/types.py) in pure numpy.

    Per type: gather the full prim rows (tables.pack_tables layout),
    Morton-sort by centroid (tight per-chunk cluster AABBs), pad to a
    PCHUNK multiple with never-hit rows, and stamp per-chunk cluster
    AABBs (over the REAL rows only) into cols 32:38. scene.light_prim is
    remapped into the concatenated [sphere | box | tri] index space."""
    import numpy as np

    from plutracer_tpu.scene.types import MegaPack

    ptype = np.asarray(scene.prim_type, np.int32)
    P = ptype.shape[0]
    rows = np.zeros((P, MEGA_W), np.float32)
    rows[:, 0] = ptype
    rows[:, 1:4] = np.asarray(scene.prim_a, np.float32)
    rows[:, 4:7] = np.asarray(scene.prim_b, np.float32)
    rows[:, 7:10] = np.asarray(scene.prim_c, np.float32)
    rows[:, 10:13] = np.asarray(scene.prim_n0, np.float32)
    rows[:, 13:16] = np.asarray(scene.prim_n1, np.float32)
    rows[:, 16:19] = np.asarray(scene.prim_n2, np.float32)
    rows[:, 19:21] = np.asarray(scene.prim_uv0, np.float32)
    rows[:, 21:23] = np.asarray(scene.prim_uv1, np.float32)
    rows[:, 23:25] = np.asarray(scene.prim_uv2, np.float32)
    rows[:, 25] = np.asarray(scene.prim_material, np.float32)
    rows[:, 26] = np.asarray(scene.prim_light, np.float32)
    rows[:, 27] = np.asarray(scene.prim_area, np.float32)
    # sphere rows: parent-AABB phantom cull box (ops.bvh.
    # parent_bounds_tables) in the spare cols — pmin 28:31, pmax (31,38,39)
    rows[:, 28:31] = -3.0e38
    rows[:, 31] = 3.0e38
    rows[:, 38:40] = 3.0e38
    cull = getattr(scene, "cull_rows", None)
    if cull and getattr(scene, "parent_min", None) is not None:
        cr = np.asarray(cull, np.int64)
        pmn = np.asarray(scene.parent_min, np.float32)[cr]
        pmx = np.asarray(scene.parent_max, np.float32)[cr]
        rows[cr, 28:31] = pmn
        rows[cr, 31] = pmx[:, 0]
        rows[cr, 38] = pmx[:, 1]
        rows[cr, 39] = pmx[:, 2]

    a, b, c = rows[:, 1:4], rows[:, 4:7], rows[:, 7:10]
    r = b[:, 0:1]
    # per-prim AABB (min, max) by type
    lo = np.where(
        (ptype == PRIM_SPHERE)[:, None], a - r,
        np.where((ptype == PRIM_BOX)[:, None], a, np.minimum(np.minimum(a, b), c)),
    )
    hi = np.where(
        (ptype == PRIM_SPHERE)[:, None], a + r,
        np.where((ptype == PRIM_BOX)[:, None], b, np.maximum(np.maximum(a, b), c)),
    )
    cen = (lo + hi) * 0.5
    span = np.maximum(cen.max(0) - cen.min(0), 1e-9)
    codes = _morton3((cen - cen.min(0)) / span)

    new_index = np.zeros(P, np.int64)
    tbls = []
    offset = 0
    for t in (PRIM_SPHERE, PRIM_BOX, PRIM_TRIANGLE):
        (idx,) = np.nonzero(ptype == t)
        idx = idx[np.argsort(codes[idx], kind="stable")]
        n = idx.size
        n_pad = -(-max(n, 1) // PCHUNK) * PCHUNK if n else 0
        width = MEGA_W
        if n_pad >= HBM_MIN_ROWS:
            # HBM-tier table: DMA'd in SLAB_ROWS slabs — round rows up so
            # the slab loop needs no partial-slab handling (padding rows
            # are never-hit, all-padding chunks carry empty cluster
            # AABBs), and pad the lane dim to 128: Mosaic requires DMA
            # slice shapes 128-aligned on the minor dimension
            n_pad = -(-n_pad // SLAB_ROWS) * SLAB_ROWS
            width = 128
        tbl = np.zeros((n_pad, width), np.float32)
        if n:
            tbl[:n, :MEGA_W] = rows[idx]
            new_index[idx] = offset + np.arange(n)
            # never-hit padding (see intersect_kernel.pack_prims_np notes)
            tbl[n:, 0] = t
            if t == PRIM_SPHERE:
                tbl[n:, 1] = 1.0e30
            elif t == PRIM_BOX:
                tbl[n:, 1:4] = 1.0e30
                tbl[n:, 4:7] = 2.0e30
            tbl[n:, 26] = -1.0
            tbl[n:, 27] = 1.0
            plo, phi = lo[idx], hi[idx]
            # rows carrying a real parent-AABB phantom cull box: the
            # reference KEEPS a sphere hit whenever the ray LINE crosses
            # the parent box (no t >= 0 bound, cmmn.h:150-172), but the
            # chunk cluster cull below is a bounded RAY test over the
            # union of own-AABBs — it would skip phantom hits whose box
            # lies behind the ray or outside the Morton cluster. Give
            # such chunks an everything-box so the cull never skips them
            # (matches _closest / the XLA oracle exactly; sphere tables
            # are tiny, so the cost is nil).
            has_cull = rows[idx, 28] > -2.9e38
            for ci in range(n_pad // PCHUNK):
                s, e = ci * PCHUNK, min((ci + 1) * PCHUNK, n)
                if s < n:
                    if t == PRIM_SPHERE and has_cull[s:e].any():
                        tbl[ci * PCHUNK : (ci + 1) * PCHUNK, 32:35] = -3.0e38
                        tbl[ci * PCHUNK : (ci + 1) * PCHUNK, 35:38] = 3.0e38
                        continue
                    tbl[ci * PCHUNK : (ci + 1) * PCHUNK, 32:35] = plo[s:e].min(0)
                    tbl[ci * PCHUNK : (ci + 1) * PCHUNK, 35:38] = phi[s:e].max(0)
                else:  # all-padding chunk: empty AABB never hits
                    tbl[ci * PCHUNK : (ci + 1) * PCHUNK, 32:35] = 1.0e30
                    tbl[ci * PCHUNK : (ci + 1) * PCHUNK, 35:38] = -1.0e30
        tbls.append(tbl)
        offset += n_pad

    lp = np.asarray(scene.light_prim, np.int32)
    light_prim = np.where(lp >= 0, new_index[np.clip(lp, 0, max(P - 1, 0))], -1)
    return MegaPack(
        sph=tbls[0], box=tbls[1], tri=tbls[2],
        light_prim=light_prim.astype(np.int32),
        scene_to_mega=new_index.astype(np.int32),
    )


# ---------------------------------------------------------------------------
# component-tuple vector helpers ((32,128) per component)
# ---------------------------------------------------------------------------


def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _vmul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _vneg(a):
    return (-a[0], -a[1], -a[2])


def _vwhere(m, a, b):
    return (
        jnp.where(m, a[0], b[0]),
        jnp.where(m, a[1], b[1]),
        jnp.where(m, a[2], b[2]),
    )


def _vnormalize(a):
    r = jax.lax.rsqrt(_vdot(a, a) + 1e-30)
    return _vscale(a, r)


def _safe_div(a, b):
    return a / jnp.where(b == 0.0, 1.0, b)


def _safe_sqrt(x):
    return jnp.sqrt(jnp.where(x > 0.0, x, 1.0)) * jnp.where(x > 0.0, 1.0, 0.0)


def _acos(x):
    """arccos via the A&S 4.4.46 minimax polynomial (|err| < 2e-8 rad —
    below f32 resolution of the result): Mosaic lowers neither acos nor
    atan2. Inputs are already clipped to [-1, 1] at every call site."""
    ax = jnp.abs(x)
    s = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0))
    p = -0.0012624911
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * ax + c
    r = s * p
    return jnp.where(x < 0.0, PI - r, r)


# ---------------------------------------------------------------------------
# in-kernel table row fetch: unrolled select chain over table rows
# (gathers have no VPU lowering; row counts are statically <= MAX_*)
# ---------------------------------------------------------------------------


def _sel_rows(tbl, idx, cols):
    """rows[idx][cols] as an unrolled where-chain over PRE-LOADED scalar
    rows (tbl: list of per-row column tuples — loaded once per program,
    outside the bounce loop, so the VMEM scalar reads are loop-invariant).
    idx: (32,128) i32. Returns one (32,128) f32 array per column."""
    outs = [jnp.full(idx.shape, tbl[0][c]) for c in cols]
    for p in range(1, len(tbl)):
        m = idx == p
        outs = [jnp.where(m, tbl[p][c], o) for c, o in zip(cols, outs)]
    return outs


# ---------------------------------------------------------------------------
# per-row intersection t (ops/intersect.py:49-91, same accept rules)
# ---------------------------------------------------------------------------


def _sphere_t_row(o, d, a, r):
    v = _vsub(o, a)
    qb = -_vdot(v, d)
    det = qb * qb - _vdot(v, v) + r * r
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    i1 = qb - sq
    i2 = qb + sq
    return jnp.where((det >= 0.0) & (i1 > 0.0) & (i2 > 0.0), i1, _BIG)


def _box_t_row(o, d, a, b):
    rx = 1.0 / jnp.where(d[0] == 0.0, 1e-20, d[0])
    ry = 1.0 / jnp.where(d[1] == 0.0, 1e-20, d[1])
    rz = 1.0 / jnp.where(d[2] == 0.0, 1e-20, d[2])
    t1x, t2x = (a[0] - o[0]) * rx, (b[0] - o[0]) * rx
    t1y, t2y = (a[1] - o[1]) * ry, (b[1] - o[1]) * ry
    t1z, t2z = (a[2] - o[2]) * rz, (b[2] - o[2]) * rz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    return jnp.where((tmax >= tmin) & (tmin >= 0.0), tmin, _BIG)


def _tri_t_row(o, d, a, b, c):
    e1 = _vsub(b, a)
    e2 = _vsub(c, a)
    pv = _vcross(d, e2)
    det = _vdot(e1, pv)
    idet = 1.0 / jnp.where(det == 0.0, 1.0, det)
    tv = _vsub(o, a)
    u = _vdot(tv, pv) * idet
    qv = _vcross(tv, e1)
    v = _vdot(d, qv) * idet
    t = _vdot(e2, qv) * idet
    ok = (
        (det != 0.0)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    return jnp.where(ok, t, _BIG)


def _t_rowvals(ty, o, d, a, b, c):
    """t for one primitive row against a ray tile; ty is the row's scalar
    type. Branch-free (compute all three intersectors + select): Mosaic
    lowers vector-valued lax.switch/cond poorly inside scf loops — the
    predicated form vectorizes cleanly and, at the table sizes the
    megakernel admits, the 3x arithmetic is noise."""
    ts = _sphere_t_row(o, d, a, b[0])
    tb = _box_t_row(o, d, a, b)
    tt = _tri_t_row(o, d, a, b, c)
    return jnp.where(ty == PRIM_SPHERE, ts, jnp.where(ty == PRIM_BOX, tb, tt))


def _line_hit_row(o, rinv, mn, mx):
    """Reference aabb::hit slab LINE test (inc/cmmn.h:150-172, tmax >=
    tmin, no positivity) of one scalar box vs a tile of rays. mn/mx:
    3-tuples of scalars; o: 3-tuple of tiles; rinv: precomputed 1/d."""
    tmin = None
    tmax = None
    for i in range(3):
        t1 = (mn[i] - o[i]) * rinv[i]
        t2 = (mx[i] - o[i]) * rinv[i]
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        tmin = lo if tmin is None else jnp.maximum(tmin, lo)
        tmax = hi if tmax is None else jnp.minimum(tmax, hi)
    return tmax >= tmin


def _closest(prim_rows, o, d, cull=None):
    """Brute-force closest hit over all pre-loaded table rows. Returns
    (found, prim, t). prim_rows: list of (ty, a, b, c) scalar tuples.

    cull: optional dict {row k: (pmin, pmax) scalar 3-tuples} — the
    reference bvh_tree's internal-node phantom-hit cull collapsed to the
    leaf's parent AABB (ops.bvh.parent_bounds_tables); rows present only
    compete when the ray LINE crosses their box."""
    best_t = jnp.full(TILE, _BIG)
    best_p = jnp.zeros(TILE, jnp.int32)
    rinv = None
    if cull:
        rinv = tuple(1.0 / jnp.where(c == 0.0, 1e-20, c) for c in d)
    for k, (ty, a, b, c) in enumerate(prim_rows):
        tk = _t_rowvals(ty, o, d, a, b, c)
        if cull and k in cull:
            mn, mx = cull[k]
            tk = jnp.where(_line_hit_row(o, rinv, mn, mx), tk, _BIG)
        better = tk < best_t
        best_t = jnp.where(better, tk, best_t)
        best_p = jnp.where(better, k, best_p)
    return best_t < T_MAX, best_p, best_t


def _prim_t_perray(rows, o, d):
    """t against ONE per-ray primitive row (compute-all-types + select;
    ops/intersect.py:_prim_t_batched)."""
    ty, a, b, c = rows["ptype"], rows["a"], rows["b"], rows["c"]
    ts = _sphere_t_row(o, d, a, b[0])
    tb = _box_t_row(o, d, a, b)
    tt = _tri_t_row(o, d, a, b, c)
    return jnp.where(ty == PRIM_SPHERE, ts, jnp.where(ty == PRIM_BOX, tb, tt))


# ---------------------------------------------------------------------------
# hit detail (ops/intersect.py:225-342)
# ---------------------------------------------------------------------------


def _detail_norm(rows, p, o, d):
    """Geometric normal only (for area-light pdfs; hit_detail_rows' norm)."""
    a, b, c = rows["a"], rows["b"], rows["c"]
    sn = _vnormalize(_vsub(p, a))
    bn = _box_norm(p, a, b)[0]
    tn = _tri_norm(a, b, c)[0]
    ty = rows["ptype"]
    is_s = ty == PRIM_SPHERE
    is_b = ty == PRIM_BOX
    return _vwhere(is_s, sn, _vwhere(is_b, bn, tn))


def _box_norm(p, a, b):
    """Nearest-face normal + (mci, sign) (src/surfaces/box.cpp:37-62)."""
    cx, cy, cz = (
        (a[0] + b[0]) * 0.5,
        (a[1] + b[1]) * 0.5,
        (a[2] + b[2]) * 0.5,
    )
    ex, ey, ez = b[0] - cx, b[1] - cy, b[2] - cz
    nx_, ny_, nz_ = p[0] - cx, p[1] - cy, p[2] - cz
    d0 = jnp.abs(ex - jnp.abs(nx_))
    d1 = jnp.abs(ey - jnp.abs(ny_))
    d2 = jnp.abs(ez - jnp.abs(nz_))
    # first minimum (jnp.argmin tie rule, matches the reference's strict <)
    is0 = (d0 <= d1) & (d0 <= d2)
    is1 = (~is0) & (d1 <= d2)
    is2 = ~(is0 | is1)
    sgn = lambda v: jnp.where(v < 0.0, -1.0, 1.0)  # sign(0) -> +1
    norm = (
        jnp.where(is0, sgn(nx_), 0.0),
        jnp.where(is1, sgn(ny_), 0.0),
        jnp.where(is2, sgn(nz_), 0.0),
    )
    mci = jnp.where(is0, 0, jnp.where(is1, 1, 2))
    return norm, mci


def _tri_norm(a, b, c):
    """cross(U,V) of normalized edges, left unnormalized (triangle.cpp:27)."""
    e1 = _vsub(b, a)
    e2 = _vsub(c, a)
    U = _vnormalize(e1)
    V = _vnormalize(e2)
    return _vcross(U, V), (U, e1, e2)


def _hit_detail(rows, o, d, t, found):
    """Full shading detail for per-ray winner rows. Returns
    (p, norm, uv, dpdu) with uv = (u, v) pair."""
    t_safe = jnp.where(found, t, 1.0)
    p = _vadd(o, _vscale(d, t_safe))
    a, b, c = rows["a"], rows["b"], rows["c"]

    # sphere (src/surfaces/sphere.cpp:28-44)
    sn = _vnormalize(_vsub(p, a))
    cos_phi = -sn[1]
    phi = _acos(jnp.clip(cos_phi, -1.0, 1.0))
    sin_phi = jnp.sin(phi)
    sv = phi * INV_PI
    safe_sin = jnp.where(sin_phi == 0.0, 1.0, sin_phi)
    ct = jnp.clip(-sn[2] / safe_sin, -1.0, 1.0)
    theta = _acos(ct) * (2.0 * INV_PI)
    theta = jnp.where(sin_phi == 0.0, 0.0, theta)
    theta = jnp.where(sn[0] >= 0.0, 1.0 - theta, theta)
    suv = (theta, sv)
    two_pi = 2.0 * PI
    sdpdu = (-two_pi * p[1], two_pi * p[0], jnp.zeros_like(p[0]))
    deg = _vdot(sdpdu, sdpdu) < 1e-20
    # fallback cross((0,1,0), norm) = (n_z, 0, -n_x)
    sdpdu = _vwhere(deg, (sn[2], jnp.zeros_like(sn[2]), -sn[0]), sdpdu)

    # box (src/surfaces/box.cpp:29-62)
    bn, mci = _box_norm(p, a, b)
    idx_u = jnp.where(mci == 2, 1, 0)
    idx_v = jnp.where(mci == 0, 1, jnp.where(mci == 1, 2, 0))
    pick3 = lambda v, i: jnp.where(i == 0, v[0], jnp.where(i == 1, v[1], v[2]))
    buv = (pick3(p, idx_u), pick3(p, idx_v))
    one = jnp.ones_like(p[0])
    zero = jnp.zeros_like(p[0])
    bdpdu = (
        jnp.where(idx_u == 0, one, zero),
        jnp.where(idx_u == 1, one, zero),
        jnp.where(idx_u == 2, one, zero),
    )

    # triangle (src/surfaces/triangle.cpp:5-33 + swapped bary weights)
    tn, (U, e1, e2) = _tri_norm(a, b, c)
    pv = _vcross(d, e2)
    det = _vdot(e1, pv)
    idet = 1.0 / jnp.where(det == 0.0, 1.0, det)
    tv = _vsub(o, a)
    tu = _vdot(tv, pv) * idet
    qv = _vcross(tv, e1)
    tvv = _vdot(d, qv) * idet
    tw = 1.0 - (tu + tvv)
    uv0, uv1, uv2 = rows["uv0"], rows["uv1"], rows["uv2"]
    tuv = (
        uv0[0] * tu + uv1[0] * tvv + uv2[0] * tw,
        uv0[1] * tu + uv1[1] * tvv + uv2[1] * tw,
    )

    ty = rows["ptype"]
    is_s = ty == PRIM_SPHERE
    is_b = ty == PRIM_BOX
    norm = _vwhere(is_s, sn, _vwhere(is_b, bn, tn))
    uv = (
        jnp.where(is_s, suv[0], jnp.where(is_b, buv[0], tuv[0])),
        jnp.where(is_s, suv[1], jnp.where(is_b, buv[1], tuv[1])),
    )
    dpdu = _vwhere(is_s, sdpdu, _vwhere(is_b, bdpdu, U))
    return p, norm, uv, dpdu


# ---------------------------------------------------------------------------
# textures (ops/texture.py; no image textures in-kernel)
# ---------------------------------------------------------------------------


def _atlas_planes(scene):
    """VMEM-pinnable image atlas as three (R, 128) channel planes +
    static row count (0 = no image textures; dummies still passed so
    kernel signatures stay uniform)."""
    A = scene.atlas.shape[0]
    if A > 1:
        A_pad = -(-A // 128) * 128
        flat = jnp.pad(scene.atlas, ((0, A_pad - A), (0, 0)))
        return tuple(flat[:, c].reshape(-1, 128) for c in range(3)), A_pad // 128
    return tuple(jnp.zeros((1, 128), jnp.float32) for _ in range(3)), 0


def _atlas_fetch(atlas_tiles, flat):
    """Nearest-texel fetch from the VMEM-resident atlas.

    atlas_tiles: 3-tuple of (R, 128) f32 refs (r/g/b channel planes, the
    flat (A,) atlas reshaped row-major); flat: (32, 128) i32 texel ids.
    Mosaic on this TPU supports dynamic gather along LANES only
    (tpu.dynamic_gather dim 1), so the fetch iterates the R atlas rows:
    broadcast row q across sublanes, lane-gather flat%128 within it, and
    select where flat//128 == q. Cost ~4 VPU ops x R x 3 channels per
    call — R <= 32 under the MAX_ATLAS eligibility gate."""
    R = atlas_tiles[0].shape[0]
    q = flat // 128
    m = flat % 128
    outs = [jnp.zeros(TILE), jnp.zeros(TILE), jnp.zeros(TILE)]
    for qi in range(R):
        sel = q == qi
        for c in range(3):
            rowt = jnp.broadcast_to(atlas_tiles[c][qi : qi + 1, :], TILE)
            part = jnp.take_along_axis(rowt, m, axis=1)
            outs[c] = jnp.where(sel, part, outs[c])
    return (outs[0], outs[1], outs[2])


def _eval_albedo(mrows, trows, uv, atlas_tiles=None):
    ttype = trows["ttype"]
    scale = trows["scale"]
    c0, c1 = trows["c0"], trows["c1"]
    fu = uv[0] * scale
    fv = uv[1] * scale
    # checkerboard
    idx = jnp.mod(jnp.floor(fu) + jnp.floor(fv), 2.0)
    checker = _vwhere(idx < 1.0, c0, c1)
    # grid: glm step(fract, line)
    gru = jnp.where(trows["line"] >= fu - jnp.floor(fu), 1.0, 0.0)
    grv = jnp.where(trows["line"] >= fv - jnp.floor(fv), 1.0, 0.0)
    m = jnp.maximum(gru, grv)
    grid = _vadd(c1, _vscale(_vsub(c0, c1), m))  # bg + (fg-bg)*m; fg=c0, bg=c1
    texval = _vwhere(ttype == TEX_CHECKERBOARD, checker, grid)
    if atlas_tiles is not None:
        # image: wrap-mode nearest texel (ops/texture.py::_image,
        # texture.h:53-60); only evaluated when the scene carries an atlas
        cu = uv[0] - jnp.floor(uv[0])
        cv = uv[1] - jnp.floor(uv[1])
        w = trows["img_w"]
        h = trows["img_h"]
        icx = jnp.minimum((cu * w).astype(jnp.int32), w.astype(jnp.int32) - 1)
        icy = jnp.minimum((cv * h).astype(jnp.int32), h.astype(jnp.int32) - 1)
        flat = trows["img_ofs"].astype(jnp.int32) + icy * w.astype(jnp.int32) + icx
        flat = jnp.maximum(flat, 0)
        img = _atlas_fetch(atlas_tiles, flat)
        from plutracer_tpu.scene.types import TEX_IMAGE as _TI

        texval = _vwhere(ttype == _TI, img, texval)
    return _vwhere(mrows["tex"] >= 0.0, texval, mrows["color"])


# ---------------------------------------------------------------------------
# sampling distributions (ops/sampling.py)
# ---------------------------------------------------------------------------


def _concentric_disk(u0, u1):
    ux = 2.0 * u0 - 1.0
    uy = 2.0 * u1 - 1.0
    zero = (ux == 0.0) & (uy == 0.0)
    cond_a = ux >= -uy
    cond_b = ux > uy
    cond_c = ux <= uy
    safe = lambda x: jnp.where(x == 0.0, 1.0, x)
    phi_a1 = jnp.where(uy > 0.0, uy / safe(ux), 8.0 + uy / safe(ux))
    phi_a2 = 2.0 - ux / safe(uy)
    phi_b1 = 4.0 - uy / safe(ux)
    phi_b2 = 6.0 - ux / safe(uy)
    r = jnp.where(cond_a, jnp.where(cond_b, ux, uy), jnp.where(cond_c, -ux, -uy))
    phi = jnp.where(
        cond_a, jnp.where(cond_b, phi_a1, phi_a2), jnp.where(cond_c, phi_b1, phi_b2)
    ) * (PI * 0.25)
    dx = jnp.cos(phi) * r
    dy = jnp.sin(phi) * r
    return jnp.where(zero, 0.0, dx), jnp.where(zero, 0.0, dy)


def _cosine_hemisphere(u0, u1):
    dx, dy = _concentric_disk(u0, u1)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - (dx * dx + dy * dy)))
    return (dx, dy, z)


def _uniform_sphere(u0, u1):
    z = 1.0 - 2.0 * u0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u1
    return (r * jnp.cos(phi), r * jnp.sin(phi), z)


# ---------------------------------------------------------------------------
# BSDF (ops/bsdf.py)
# ---------------------------------------------------------------------------


def _make_frame(norm, dpdu):
    s = _vnormalize(dpdu)
    t = _vcross(norm, s)
    return (s, t, norm)


def _w2l(f, v):
    return (_vdot(v, f[0]), _vdot(v, f[1]), _vdot(v, f[2]))


def _l2w(f, v):
    return _vadd(
        _vadd(_vscale(f[0], v[0]), _vscale(f[1], v[1])), _vscale(f[2], v[2])
    )


def _fresnel_conductor(cos_i, eta, k):
    """Incl. the Rperp2 == 1 quirk (inc/material.h:36-45)."""
    ci = jnp.abs(cos_i)
    out = []
    for j in range(3):
        tmp0 = eta[j] * eta[j] + k[j] * k[j]
        tmp1 = tmp0 * ci * ci
        rparl2 = (tmp1 - 2.0 * eta[j] * ci + 1.0) / (
            tmp1 + 2.0 * eta[j] * ci + 1.0
        )
        out.append((rparl2 + 1.0) * 0.5)
    return tuple(out)


def _fresnel_dielectric_eval(cos_i, fr_eta_i, fr_eta_t):
    """fresnel_dielectric::operator() (inc/material.h:95-105)."""
    ci = jnp.clip(cos_i, -1.0, 1.0)
    entering = ci > 0.0
    fr_eta_i = jnp.where(fr_eta_i == 0.0, 1.0, fr_eta_i)
    fr_eta_t = jnp.where(fr_eta_t == 0.0, 1.0, fr_eta_t)
    ei = jnp.where(entering, fr_eta_t, fr_eta_i)
    et = jnp.where(entering, fr_eta_i, fr_eta_t)
    sin_t = ei / et * _safe_sqrt(1.0 - ci * ci)
    tir = sin_t >= 1.0
    cos_t = _safe_sqrt(1.0 - sin_t * sin_t)
    aci = jnp.abs(ci)
    rparl = (et * aci - ei * cos_t) / (et * aci + ei * cos_t)
    rperp = (ei * aci - et * cos_t) / (ei * aci + et * cos_t)
    f = (rparl * rparl + rperp * rperp) * 0.5
    return jnp.where(tir, 1.0, f)


def _bsdf_sample(frame, mrows, wwo, u_select, u0, u1, non_specular_only):
    """ops/bsdf.py::bsdf_sample in component form. Returns a dict with
    f (3-tuple), wwi (3-tuple), pdf, is_specular."""
    mtype = mrows["mtype"]
    albedo = mrows["albedo"]
    eta3 = mrows["eta"]
    k3 = mrows["k"]
    wo = _w2l(frame, wwo)
    cos_wo = wo[2]

    # lambert: cosine hemisphere flipped into wo's hemisphere
    wi_d = _cosine_hemisphere(u0, u1)
    flip = jnp.where(cos_wo < 0.0, -1.0, 1.0)
    wi_d = (wi_d[0], wi_d[1], wi_d[2] * flip)
    pdf_d = jnp.abs(wi_d[2]) * INV_PI
    wwi_d = _l2w(frame, wi_d)
    same_side_d = _vdot(wwi_d, frame[2]) * _vdot(wwo, frame[2]) > 0.0
    f_d = _vwhere(same_side_d, _vscale(albedo, INV_PI), (0.0, 0.0, 0.0))

    is_diffuse = mtype == MAT_DIFFUSE
    if non_specular_only:
        # only lambert matches types = all & ~specular (material.cpp:19-23)
        zero3 = (jnp.zeros_like(cos_wo),) * 3
        return {
            "f": _vwhere(is_diffuse, f_d, zero3),
            "wwi": _vwhere(is_diffuse, wwi_d, wwo),
            "pdf": jnp.where(is_diffuse, pdf_d, 0.0),
            "is_specular": jnp.zeros_like(is_diffuse),
        }

    # specular reflection (mirror / glass reflection half)
    wi_r = (-wo[0], -wo[1], wo[2])
    wwi_r = _l2w(frame, wi_r)
    abs_cos_r = jnp.maximum(jnp.abs(wi_r[2]), 1e-20)
    frc = _fresnel_conductor(cos_wo, eta3, k3)
    f_mirror = tuple(frc[j] * albedo[j] / abs_cos_r for j in range(3))
    ior = eta3[0]
    fr_glass = _fresnel_dielectric_eval(cos_wo, jnp.ones_like(ior), ior)
    f_glass_r = tuple(fr_glass * albedo[j] / abs_cos_r for j in range(3))

    # specular transmission (inc/material.h:137-150)
    def transmission(et_ctor, ei_ctor):
        et_c = jnp.where(et_ctor == 0.0, 1.0, et_ctor)
        ei_c = jnp.where(ei_ctor == 0.0, 1.0, ei_ctor)
        entering = cos_wo > 0.0
        ei = jnp.where(entering, et_c, ei_c)
        et = jnp.where(entering, ei_c, et_c)
        sin2_i = jnp.maximum(0.0, 1.0 - cos_wo * cos_wo)
        eta = ei / et
        sin2_t = eta * eta * sin2_i
        tir = sin2_t >= 1.0
        cos_t = _safe_sqrt(1.0 - sin2_t)
        cos_t = jnp.where(entering, -cos_t, cos_t)
        wi = (eta * -wo[0], eta * -wo[1], cos_t)
        fr = _fresnel_dielectric_eval(cos_wo, et_c, ei_c)
        scale = (et * et) / (ei * ei)
        denom = jnp.maximum(jnp.abs(cos_t), 1e-20)
        f = tuple(
            jnp.where(tir, 0.0, scale * (1.0 - fr) * albedo[j] / denom)
            for j in range(3)
        )
        return f, wi, ~tir

    f_t_refract, wi_t_refract, ok_refract = transmission(eta3[0], eta3[1])
    f_t_glass, wi_t_glass, ok_glass = transmission(jnp.ones_like(ior), ior)
    wwi_t_refract = _l2w(frame, wi_t_refract)
    wwi_t_glass = _l2w(frame, wi_t_glass)

    is_mirror = mtype == MAT_MIRROR
    is_refract = mtype == MAT_REFRACT
    is_glass = mtype == MAT_GLASS

    pick_refl = u_select < 0.5
    f_glass = _vwhere(pick_refl, f_glass_r, f_t_glass)
    wwi_glass = _vwhere(pick_refl, wwi_r, wwi_t_glass)
    ok_glass_sel = pick_refl | ok_glass  # where(m, True, x) == m | x
    pdf_glass = jnp.where(ok_glass_sel, 0.5, 0.0)

    zero3 = (jnp.zeros_like(cos_wo),) * 3
    f = _vwhere(
        is_diffuse,
        f_d,
        _vwhere(
            is_mirror,
            f_mirror,
            _vwhere(is_refract, f_t_refract, _vwhere(is_glass, f_glass, zero3)),
        ),
    )
    wwi = _vwhere(
        is_diffuse,
        wwi_d,
        _vwhere(
            is_mirror,
            wwi_r,
            _vwhere(
                is_refract, wwi_t_refract, _vwhere(is_glass, wwi_glass, wwo)
            ),
        ),
    )
    pdf = jnp.where(
        is_diffuse,
        pdf_d,
        jnp.where(
            is_mirror,
            1.0,
            jnp.where(
                is_refract,
                jnp.where(ok_refract, 1.0, 0.0),
                jnp.where(is_glass, pdf_glass, 0.0),
            ),
        ),
    )
    return {
        "f": f,
        "wwi": wwi,
        "pdf": pdf,
        "is_specular": is_mirror | is_refract | is_glass,
    }


def _bsdf_F_nee(mtype, albedo, n_world, wwo, wwi):
    same_side = _vdot(wwi, n_world) * _vdot(wwo, n_world) > 0.0
    diffuse = (mtype == MAT_DIFFUSE) & same_side
    return _vwhere(diffuse, _vscale(albedo, INV_PI), (0.0, 0.0, 0.0))


def _bsdf_pdf_nee(frame, mtype, wwo, wwi):
    wo = _w2l(frame, wwo)
    wi = _w2l(frame, wwi)
    same_hemi = wo[2] * wi[2] > 0.0
    cos_pdf = jnp.where(same_hemi, jnp.abs(wi[2]) * INV_PI, 0.0)
    return jnp.where(mtype == MAT_DIFFUSE, cos_pdf, 0.0)


# ---------------------------------------------------------------------------
# lights (ops/lights.py)
# ---------------------------------------------------------------------------


def _sample_surface(carrier, u0, u1, u_face, u_axis):
    """ops/lights.py::sample_surface_rows in component form."""
    ty = carrier["ptype"]
    a, b, c = carrier["a"], carrier["b"], carrier["c"]

    ns_s = _uniform_sphere(u0, u1)
    ps_s = _vadd(a, _vscale(ns_s, b[0]))

    # box: U = (u0, u_face, u1); snap axis mi to 0/1 face
    U = (u0, u_face, u1)
    mi = jnp.minimum((u_axis * 3.0).astype(jnp.int32), 2)
    picked = jnp.where(mi == 0, U[0], jnp.where(mi == 1, U[1], U[2]))
    snapped = jnp.where(picked > 0.5, 1.0, 0.0)
    Uc = tuple(jnp.where(mi == j, snapped, U[j]) for j in range(3))
    ps_b = _vadd(a, _vmul(Uc, _vsub(b, a)))
    sgn_face = jnp.where(picked > 0.5, 1.0, -1.0)
    ns_b = tuple(jnp.where(mi == j, sgn_face, 0.0) for j in range(3))

    # triangle barycentric with w = 1-(u0+u1) (reference-faithful)
    wz = 1.0 - (u0 + u1)
    ps_t = _vadd(
        _vadd(_vscale(a, u0), _vscale(b, u1)), _vscale(c, wz)
    )
    n0, n1, n2 = carrier["n0"], carrier["n1"], carrier["n2"]
    ns_t = _vadd(
        _vadd(_vscale(n0, u0), _vscale(n1, u1)), _vscale(n2, wz)
    )

    is_s = ty == PRIM_SPHERE
    is_b = ty == PRIM_BOX
    ps = _vwhere(is_s, ps_s, _vwhere(is_b, ps_b, ps_t))
    ns = _vwhere(is_s, ns_s, _vwhere(is_b, ns_b, ns_t))
    return ps, ns


def _surface_pdf(carrier, p, wi, origin_distance_pdf):
    """ops/lights.py::surface_pdf_rows in component form."""
    t = _prim_t_perray(carrier, p, wi)
    found = t < T_MAX
    ts = jnp.where(found, t, 0.0)
    hitp = _vadd(p, _vscale(wi, ts))
    norm = _detail_norm(carrier, hitp, p, wi)
    if origin_distance_pdf:
        dist2 = _vdot(hitp, hitp)
    else:
        dist2 = ts * ts
    denom = jnp.abs(_vdot(norm, _vneg(wi))) * carrier["area"]
    pdf = dist2 / jnp.maximum(denom, 1e-20)
    return jnp.where(found, pdf, 0.0)


def _sample_light(lrows, carrier, p, u0, u1, u_face, u_axis, origin_pdf):
    """ops/lights.py::sample_light_rows in component form."""
    is_delta = lrows["ltype"] == LIGHT_POINT
    l2p = _vsub(lrows["pos"], p)
    len2 = jnp.maximum(_vdot(l2p, l2p), 1e-20)
    inv_len = jax.lax.rsqrt(len2)
    wi_p = _vscale(l2p, inv_len)
    li_p = _vscale(lrows["intensity"], 1.0 / len2)

    ps, ns = _sample_surface(carrier, u0, u1, u_face, u_axis)
    wi_a = _vnormalize(_vsub(ps, p))
    pdf_a = _surface_pdf(carrier, p, wi_a, origin_pdf)
    front = _vdot(ns, _vneg(wi_a)) > 0.0
    li_a = _vwhere(front, lrows["intensity"], (0.0, 0.0, 0.0))

    return {
        "Li": _vwhere(is_delta, li_p, li_a),
        "wi": _vwhere(is_delta, wi_p, wi_a),
        "pdf": jnp.where(is_delta, jnp.ones_like(len2), pdf_a),
        "is_delta": is_delta,
    }


# ---------------------------------------------------------------------------
# the megakernel
# ---------------------------------------------------------------------------


DBG_C = 12  # per-bounce debug channels (see _build_kernel debug=True)


def _spec_to_dict(spec, vals):
    """Regroup a flat column-value list by a {name: col | (cols...)} spec."""
    out, k = {}, 0
    for name, cols in spec.items():
        if isinstance(cols, tuple):
            out[name] = tuple(vals[k : k + len(cols)])
            k += len(cols)
        else:
            out[name] = vals[k]
            k += 1
    return out


def _spec_cols(spec):
    flat_cols = []
    for name, cols in spec.items():
        flat_cols.extend(cols if isinstance(cols, tuple) else (cols,))
    return flat_cols


def _fetch_from(tbl, idx, spec):
    """Fetch named columns (scalars or tuples) for per-ray row idx from a
    PRE-LOADED scalar-row table (list of per-row column tuples)."""
    return _spec_to_dict(spec, _sel_rows(tbl, idx, _spec_cols(spec)))


def _build_kernel(P, M, T, L, num_lights, options, unroll=False, debug=False,
                  cull_rows=(), atlas_rows=0):
    """Kernel specialized on static table sizes + options. unroll=True
    replaces the bounce fori_loop with a Python loop (static uniform
    slices, no scf carry). cull_rows: static sphere row ids whose
    parent-AABB phantom cull applies (rows of cull_ref, in order).
    atlas_rows: static (R, 128) image-atlas plane height (0 = no image
    textures; the atlas planes are still passed as 1-row dummies)."""
    import jax.experimental.pallas as pl

    mb = options.max_bounces
    swapped_mis = options.swapped_light_mis_weight
    shading_gate = options.shading_normal_le_gate
    origin_pdf = options.origin_distance_pdf

    fetch = _fetch_from

    def kernel(prim_ref, mat_ref, tex_ref, light_ref, cull_ref,
               atlr, atlg, atlb,
               oxr, oyr, ozr, dxr, dyr, dzr, p0r, t0r, u_ref,
               lxr, lyr, lzr, *dbg_refs):
        o0 = (oxr[:, :], oyr[:, :], ozr[:, :])
        d0 = (dxr[:, :], dyr[:, :], dzr[:, :])
        prim0 = p0r[:, :]
        t0 = t0r[:, :]
        zero = jnp.zeros(TILE)
        one = jnp.ones(TILE)

        # preload EVERY table scalar once per program (loop-invariant; the
        # bounce fori_loop body then touches VMEM only for uniforms)
        prim_tbl = [tuple(prim_ref[k, c] for c in range(28)) for k in range(P)]
        mat_tbl = [tuple(mat_ref[k, c] for c in range(11)) for k in range(M)]
        tex_cols = 12 if atlas_rows else 9
        tex_tbl = [tuple(tex_ref[k, c] for c in range(tex_cols))
                   for k in range(T)]
        light_tbl = [tuple(light_ref[k, c] for c in range(8)) for k in range(L)]
        atlas_tiles = (atlr, atlg, atlb) if atlas_rows else None
        prim_geo = [
            (
                prim_tbl[k][0].astype(jnp.int32),
                (prim_tbl[k][1], prim_tbl[k][2], prim_tbl[k][3]),
                (prim_tbl[k][4], prim_tbl[k][5], prim_tbl[k][6]),
                (prim_tbl[k][7], prim_tbl[k][8], prim_tbl[k][9]),
            )
            for k in range(P)
        ]
        # static phantom-hit cull table: {prim row: (pmin, pmax)} scalar
        # parent-AABB boxes for sphere rows (see _closest / ops.bvh)
        cull = {
            row: (
                (cull_ref[i, 0], cull_ref[i, 1], cull_ref[i, 2]),
                (cull_ref[i, 3], cull_ref[i, 4], cull_ref[i, 5]),
            )
            for i, row in enumerate(cull_rows)
        }

        def u_at(i, j):
            return u_ref[pl.ds(i * 12 + j, 1), :, :].reshape(TILE)

        def body(i, carry):
            # masks ride the carry as f32 0/1 — Mosaic rejects i1 vectors
            # in scf loop carries; `found` is re-derived from t (miss=_BIG)
            (o, d, T_, Lrad, prev_spec_f, alive_f, prim, t) = carry
            prev_spec = prev_spec_f != 0.0
            alive = alive_f != 0.0
            found = t < T_MAX
            u = [u_at(i, j) for j in range(12)]

            rows = fetch(prim_tbl, prim, {
                "ptype": 0, "a": (1, 2, 3), "b": (4, 5, 6), "c": (7, 8, 9),
                "uv0": (19, 20), "uv1": (21, 22), "uv2": (23, 24),
                "material": 25, "light": 26,
            })
            rows["ptype"] = rows["ptype"].astype(jnp.int32)
            p, norm, uv, dpdu = _hit_detail(rows, o, d, t, found)
            cur = alive & found
            wwo = _vneg(d)
            mid = rows["material"].astype(jnp.int32)
            mrows = fetch(mat_tbl, mid, {
                "mtype": 0, "color": (1, 2, 3), "tex": 4,
                "eta": (5, 6, 7), "k": (8, 9, 10),
            })
            mrows["mtype"] = mrows["mtype"].astype(jnp.int32)
            tid = jnp.maximum(mrows["tex"].astype(jnp.int32), 0)
            tex_spec = {
                "ttype": 0, "c0": (1, 2, 3), "c1": (4, 5, 6),
                "scale": 7, "line": 8,
            }
            if atlas_rows:
                tex_spec.update({"img_ofs": 9, "img_w": 10, "img_h": 11})
            trows = fetch(tex_tbl, tid, tex_spec)
            albedo = _eval_albedo(mrows, trows, uv, atlas_tiles)
            mrows["albedo"] = albedo
            frame = _make_frame(norm, dpdu)

            # emitted light at the vertex (first or post-specular only)
            emit_gate = (i == 0) | prev_spec
            lid_own = jnp.maximum(rows["light"].astype(jnp.int32), 0)
            own = fetch(light_tbl, lid_own, {"intensity": (4, 5, 6)})
            has_own = rows["light"] >= 0.0
            le_gate0 = _vdot(norm, wwo) > 0.0
            g = cur & emit_gate & has_own & le_gate0
            Lrad = _vadd(Lrad, _vwhere(g, _vmul(T_, own["intensity"]),
                                       (zero, zero, zero)))

            # next-event estimation: pick one light uniformly
            li = jnp.minimum(
                jnp.floor(u[0] * num_lights).astype(jnp.int32), num_lights - 1
            )
            lrows = fetch(light_tbl, li, {
                "ltype": 0, "pos": (1, 2, 3), "intensity": (4, 5, 6),
                "prim": 7,
            })
            lrows["ltype"] = lrows["ltype"].astype(jnp.int32)
            cid = jnp.maximum(lrows["prim"].astype(jnp.int32), 0)
            carrier = fetch(prim_tbl, cid, {
                "ptype": 0, "a": (1, 2, 3), "b": (4, 5, 6), "c": (7, 8, 9),
                "n0": (10, 11, 12), "n1": (13, 14, 15), "n2": (16, 17, 18),
                "area": 27,
            })
            carrier["ptype"] = carrier["ptype"].astype(jnp.int32)
            ls = _sample_light(lrows, carrier, p, u[1], u[2], u[3], u[4],
                               origin_pdf)
            bs_nee = _bsdf_sample(frame, mrows, wwo, u[5], u[6], u[7],
                                  non_specular_only=True)
            bs = _bsdf_sample(frame, mrows, wwo, u[9], u[10], u[11],
                              non_specular_only=False)

            # three closest-hit queries (shadow | nee-bsdf | extension),
            # all originating at the shading point
            sf, sp_, _st = _closest(prim_geo, p, ls["wi"], cull=cull)
            nf, np_, _nt = _closest(prim_geo, p, bs_nee["wwi"], cull=cull)
            xf, xp, xt = _closest(prim_geo, p, bs["wwi"], cull=cull)
            (s_light,) = _sel_rows(prim_tbl, sp_, (26,))
            (n_light,) = _sel_rows(prim_tbl, np_, (26,))
            s_hits = s_light.astype(jnp.int32) == li
            n_hits = n_light.astype(jnp.int32) == li

            # ---- NEE assembly (integrator.py::_nee_contributions) ----
            f = _bsdf_F_nee(mrows["mtype"], albedo, norm, wwo, ls["wi"])
            unoccl = (~sf) | ((~ls["is_delta"]) & s_hits)
            b_pdf = _bsdf_pdf_nee(frame, mrows["mtype"], wwo, ls["wi"])
            # finite-by-construction weight math: matches the XLA
            # integrator's clipped pdfs exactly (integrator.py)
            bp = jnp.clip(b_pdf, 1e-12, 1e9)
            lp = jnp.clip(ls["pdf"], 1e-12, 1e9)
            if swapped_mis:
                w = bp * bp / (bp * bp + lp * lp)
            else:
                w = lp * lp / (bp * bp + lp * lp)
            w = jnp.where((b_pdf == 0.0) & (ls["pdf"] == 0.0), 0.0, w)
            w = jnp.where(ls["is_delta"], 1.0, w)
            gate_l = (
                (ls["pdf"] > 0.0)
                & (_vdot(ls["Li"], ls["Li"]) > 0.0)
                & (_vdot(f, f) > 0.0)
                & unoccl
            )
            scale_l = jnp.abs(_vdot(ls["wi"], norm)) * w / lp
            scale_l = jnp.where(gate_l, scale_l, 0.0)
            contrib_l = _vwhere(
                gate_l, _vscale(_vmul(f, ls["Li"]), scale_l),
                (zero, zero, zero),
            )

            # BSDF-strategy uses the NEE sample bs_nee (the XLA path passes
            # bs_nee into _nee_contributions, integrator.py:259); the
            # extension sample bs only drives the throughput update below.
            l_pdf2 = jnp.where(
                lrows["ltype"] == 1,  # LIGHT_AREA
                _surface_pdf(carrier, p, bs_nee["wwi"], origin_pdf),
                0.0,
            )
            bp2 = jnp.clip(bs_nee["pdf"], 1e-12, 1e9)
            lp2c = jnp.clip(l_pdf2, 1e-12, 1e9)
            w2 = bp2 * bp2 / (bp2 * bp2 + lp2c * lp2c)
            w2 = jnp.where((bs_nee["pdf"] == 0.0) & (l_pdf2 == 0.0), 0.0, w2)
            w2 = jnp.where(bs_nee["is_specular"], 1.0, w2)
            if shading_gate:
                le_gate = _vdot(norm, _vneg(bs_nee["wwi"])) > 0.0
            else:
                nrows = fetch(prim_tbl, np_, {
                    "ptype": 0, "a": (1, 2, 3), "b": (4, 5, 6), "c": (7, 8, 9),
                })
                nrows["ptype"] = nrows["ptype"].astype(jnp.int32)
                ts_n = jnp.where(nf, _nt, 0.0)
                hp_n = _vadd(p, _vscale(bs_nee["wwi"], ts_n))
                nee_norm = _detail_norm(nrows, hp_n, p, bs_nee["wwi"])
                le_gate = _vdot(nee_norm, _vneg(bs_nee["wwi"])) > 0.0
            same_light = nf & n_hits
            Li2 = _vwhere(same_light & le_gate, lrows["intensity"],
                          (zero, zero, zero))
            gate_b = (
                (~ls["is_delta"])
                & (_vdot(bs_nee["f"], bs_nee["f"]) > 0.0)
                & (bs_nee["pdf"] > 0.0)
                & (bs_nee["is_specular"] | (l_pdf2 != 0.0))
                & nf
                & (_vdot(Li2, Li2) > 0.0)
            )
            scale_b = jnp.abs(_vdot(bs_nee["wwi"], norm)) * w2 / bp2
            scale_b = jnp.where(gate_b, scale_b, 0.0)
            contrib_b = _vwhere(
                gate_b, _vscale(_vmul(bs_nee["f"], Li2), scale_b),
                (zero, zero, zero),
            )
            Ld = _vadd(contrib_l, contrib_b)
            Lrad = _vadd(
                Lrad,
                _vwhere(cur, _vscale(_vmul(T_, Ld), float(num_lights)),
                        (zero, zero, zero)),
            )

            # throughput update + path termination
            ok = (_vdot(bs["f"], bs["f"]) > 0.0) & (bs["pdf"] > 0.0)
            alive_next = cur & ok & (i <= mb - 2)
            # clamped weight/product (1e12 / 1e16): keeps deep
            # degenerate-frame chains f32-finite; matches the XLA
            # integrator's throughput clamp exactly (integrator.py)
            tscale = (jnp.abs(_vdot(bs["wwi"], norm))
                      / jnp.clip(bs["pdf"], 1e-12, 1e9))
            w_b = tuple(jnp.minimum(fc * tscale, 1.0e12) for fc in bs["f"])
            T_next = tuple(
                jnp.minimum(tc * wc, 1.0e16) for tc, wc in zip(T_, w_b)
            )
            T_ = _vwhere(alive_next, T_next, T_)

            if debug:
                dbg = dbg_refs[0]
                ch = [t, prim.astype(jnp.float32),
                      jnp.maximum(jnp.maximum(T_[0], T_[1]), T_[2]),
                      bs["pdf"], _vdot(bs["f"], bs["f"]),
                      ls["pdf"], l_pdf2,
                      Ld[0] + Ld[1] + Ld[2],
                      jnp.where(cur, 1.0, 0.0),
                      xt, xp.astype(jnp.float32),
                      jnp.where(bs["is_specular"], 1.0, 0.0)]
                for c, v in enumerate(ch):
                    dbg[i * DBG_C + c, :, :] = v
            return (p, bs["wwi"], T_, Lrad,
                    jnp.where(bs["is_specular"], 1.0, 0.0),
                    jnp.where(alive_next, 1.0, 0.0),
                    xp, jnp.where(xf, xt, _BIG))

        init = (o0, d0, (one, one, one), (zero, zero, zero), zero, one,
                prim0, t0)
        if unroll:
            carry = init
            for i in range(mb):
                carry = body(i, carry)
        else:
            carry = jax.lax.fori_loop(0, mb, body, init)
        Lrad = carry[3]
        lxr[:, :] = Lrad[0]
        lyr[:, :] = Lrad[1]
        lzr[:, :] = Lrad[2]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("P", "M", "T", "L", "num_lights", "options",
                              "interpret", "unroll", "debug", "cull_rows",
                              "atlas_rows")
)
def _megakernel_call(prim, mat, tex, light, cull_tbl, atl, ox, oy, oz,
                     dx, dy, dz, prim0, t0, u, P, M, T, L, num_lights,
                     options, interpret=False, unroll=False, debug=False,
                     cull_rows=(), atlas_rows=0):
    import jax.experimental.pallas as pl

    Bs = ox.shape[0]
    mb = options.max_bounces
    kernel = _build_kernel(P, M, T, L, num_lights, options, unroll=unroll,
                           debug=debug, cull_rows=cull_rows,
                           atlas_rows=atlas_rows)
    ray_spec = pl.BlockSpec((32, 128), lambda i: (i, 0))
    table_spec = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0))
    u_spec = pl.BlockSpec((u.shape[0], 32, 128), lambda i: (0, i, 0))
    out_spec = pl.BlockSpec((32, 128), lambda i: (i, 0))
    out_specs = [out_spec] * 3
    out_shape = [jax.ShapeDtypeStruct((Bs, 128), jnp.float32)] * 3
    if debug:
        out_specs.append(
            pl.BlockSpec((mb * DBG_C, 32, 128), lambda i: (0, i, 0))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((mb * DBG_C, Bs, 128), jnp.float32)
        )
    outs = pl.pallas_call(
        kernel,
        grid=(Bs // 32,),
        in_specs=[table_spec(prim), table_spec(mat), table_spec(tex),
                  table_spec(light), table_spec(cull_tbl),
                  table_spec(atl[0]), table_spec(atl[1]), table_spec(atl[2])]
        + [ray_spec] * 8 + [u_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(prim, mat, tex, light, cull_tbl, atl[0], atl[1], atl[2],
      ox, oy, oz, dx, dy, dz, prim0, t0, u)
    if debug:
        return outs  # (lx, ly, lz, dbg)
    return outs


# ---------------------------------------------------------------------------
# the STREAMING megakernel: P beyond the unrolled kernel's cap
# ---------------------------------------------------------------------------
#
# Same physics/semantics as _build_kernel, but the primitive tables are
# walked with a fori_loop over PCHUNK-row chunks (program size stays O(1)
# in P instead of O(P) unrolled code) and each chunk can be skipped for the
# whole (32, 128) ray tile when no lane's ray enters the chunk's cluster
# AABB with t below its current best (MegaPack rows are Morton-ordered, so
# chunks are spatially tight). Attribute lookups by per-lane winner id
# stream the same chunks with masked selects.


def _cluster_hit(chunk, o, rinv, bt):
    """Cluster-AABB slab test (cols 32:38 of any chunk row) vs all lanes,
    bounded by the running best t."""
    t1x, t2x = (chunk[0, 32] - o[0]) * rinv[0], (chunk[0, 35] - o[0]) * rinv[0]
    t1y, t2y = (chunk[0, 33] - o[1]) * rinv[1], (chunk[0, 36] - o[1]) * rinv[1]
    t1z, t2z = (chunk[0, 34] - o[2]) * rinv[2], (chunk[0, 37] - o[2]) * rinv[2]
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    return (tmax >= tmin) & (tmax >= 0.0) & (tmin < bt)


def _stream_chunks(entry, carry, chunk_body):
    """Walk every PCHUNK-row chunk of one MegaPack table, calling
    chunk_body(chunk_values, chunk_base_row, carry) -> carry.

    entry: (ptype, ref, offset, hbm_ctx). hbm_ctx None = the table is a
    VMEM block, chunks are sliced directly (the r3/r4 path). hbm_ctx =
    (scratch, sem) = the table lives in HBM (memory_space=ANY): walk it
    in SLAB_ROWS-row slabs through a double-buffered VMEM scratch with
    async DMA — next slab's copy is in flight while the current slab's
    chunks are processed, so for any non-trivial per-row work the DMA is
    fully hidden (HBM traffic for a full walk is table-bytes per ray
    tile; at the P where this tier engages, brute-force FLOPs dominate
    it by >100x — PERF.md r5)."""
    import jax.experimental.pallas as pl

    ty, ref, off, hbm = entry
    if hbm is None:
        nch = ref.shape[0] // PCHUNK

        def body(ci, carry):
            base = pl.multiple_of(ci * PCHUNK, PCHUNK)
            return chunk_body(ref[pl.ds(base, PCHUNK), :], base, carry)

        return jax.lax.fori_loop(0, nch, body, carry)

    from jax.experimental.pallas import tpu as pltpu

    scratch, sem = hbm
    nrows = ref.shape[0]
    assert nrows % SLAB_ROWS == 0, "HBM tables are SLAB_ROWS-padded at pack"
    assert ref.shape[1] == 128, "HBM tables are 128-col-padded at pack"
    nslab = nrows // SLAB_ROWS
    cps = SLAB_ROWS // PCHUNK

    def get_dma(slot, si):
        return pltpu.make_async_copy(
            ref.at[pl.ds(si * SLAB_ROWS, SLAB_ROWS), :],
            scratch.at[slot],
            sem.at[slot],
        )

    get_dma(0, 0).start()

    def slab_body(si, carry):
        slot = jax.lax.rem(si, 2)

        @pl.when(si + 1 < nslab)
        def _():
            get_dma(jax.lax.rem(si + 1, 2), si + 1).start()

        get_dma(slot, si).wait()

        def cbody(cj, carry):
            base = cj * PCHUNK
            chunk = scratch[slot, pl.ds(base, PCHUNK), :]
            return chunk_body(chunk, si * SLAB_ROWS + base, carry)

        return jax.lax.fori_loop(0, cps, cbody, carry)

    return jax.lax.fori_loop(0, nslab, slab_body, carry)


def _closest_stream(tbls, o, d, cull=True, live=None):
    """Brute-force closest hit streaming the per-type chunked tables.
    tbls: [(ptype, ref, offset, hbm_ctx)] with offset the table's base in
    the concatenated winner-id space. `live` masks lanes whose result
    matters (dead lanes carry stale rays that would otherwise defeat the
    cull). Returns (found, prim, t)."""
    best_t = jnp.full(TILE, _BIG)
    best_p = jnp.zeros(TILE, jnp.int32)
    rinv = tuple(1.0 / jnp.where(c == 0.0, 1e-20, c) for c in d)

    for entry in tbls:
        ty, _ref, off = entry[0], entry[1], entry[2]

        def body(chunk, base, carry, ty=ty, off=off):
            bt, bp = carry

            def work(carry):
                bt, bp = carry
                for k in range(PCHUNK):
                    a = (chunk[k, 1], chunk[k, 2], chunk[k, 3])
                    b = (chunk[k, 4], chunk[k, 5], chunk[k, 6])
                    if ty == PRIM_SPHERE:
                        tk = _sphere_t_row(o, d, a, b[0])
                        # parent-AABB phantom cull (cols 28:31,31,38,39;
                        # see pack_mega_np / ops.bvh.parent_bounds_tables)
                        pmn = (chunk[k, 28], chunk[k, 29], chunk[k, 30])
                        pmx = (chunk[k, 31], chunk[k, 38], chunk[k, 39])
                        tk = jnp.where(
                            _line_hit_row(o, rinv, pmn, pmx), tk, _BIG
                        )
                    elif ty == PRIM_BOX:
                        tk = _box_t_row(o, d, a, b)
                    else:
                        c = (chunk[k, 7], chunk[k, 8], chunk[k, 9])
                        tk = _tri_t_row(o, d, a, b, c)
                    better = tk < bt
                    bt = jnp.where(better, tk, bt)
                    bp = jnp.where(better, off + base + k, bp)
                return bt, bp

            if cull:
                hit = _cluster_hit(chunk, o, rinv, bt)
                if live is not None:
                    hit = hit & live
                return jax.lax.cond(jnp.any(hit), work, lambda c_: c_, (bt, bp))
            return work((bt, bp))

        best_t, best_p = _stream_chunks(entry, (best_t, best_p), body)
    return best_t < T_MAX, best_p, best_t


def _closest_stream3(tbls, o, d1, d2, d3, cull=True, live=None):
    """Three closest-hit queries sharing ONE stream over the tables.

    All three rays originate at the same shading point `o` (shadow,
    NEE-BSDF and extension rays all leave the current vertex —
    renderer.cpp:16,41,86), so per-row origin-dependent subexpressions
    (tv = o - a, qv = tv x e1, v.v for spheres) are computed once and
    shared across the three directions, and every chunk's scalar
    loads/broadcasts are amortized 3x. Returns three (found, prim, t)."""
    import jax.experimental.pallas as pl

    ds = (d1, d2, d3)
    bts = [jnp.full(TILE, _BIG) for _ in range(3)]
    bps = [jnp.zeros(TILE, jnp.int32) for _ in range(3)]
    rinvs = [tuple(1.0 / jnp.where(c == 0.0, 1e-20, c) for c in d)
             for d in ds]

    for entry in tbls:
        ty, _ref, off = entry[0], entry[1], entry[2]

        def body(chunk, base, carry, ty=ty, off=off):
            bt1, bt2, bt3, bp1, bp2, bp3 = carry
            bts = [bt1, bt2, bt3]
            bps = [bp1, bp2, bp3]

            def work(carry):
                bt1, bt2, bt3, bp1, bp2, bp3 = carry
                bts = [bt1, bt2, bt3]
                bps = [bp1, bp2, bp3]
                for k in range(PCHUNK):
                    a = (chunk[k, 1], chunk[k, 2], chunk[k, 3])
                    b = (chunk[k, 4], chunk[k, 5], chunk[k, 6])
                    if ty == PRIM_SPHERE:
                        v = _vsub(o, a)
                        vv = _vdot(v, v)
                        r2 = b[0] * b[0]
                        # parent-AABB phantom cull (cols 28:31,31,38,39;
                        # see pack_mega_np / ops.bvh.parent_bounds_tables)
                        pmn = (chunk[k, 28], chunk[k, 29], chunk[k, 30])
                        pmx = (chunk[k, 31], chunk[k, 38], chunk[k, 39])
                        for q in range(3):
                            qb = -_vdot(v, ds[q])
                            det = qb * qb - vv + r2
                            sq = jnp.sqrt(jnp.maximum(det, 0.0))
                            i1 = qb - sq
                            i2 = qb + sq
                            elig = _line_hit_row(o, rinvs[q], pmn, pmx)
                            tk = jnp.where(
                                (det >= 0.0) & (i1 > 0.0) & (i2 > 0.0)
                                & elig,
                                i1, _BIG)
                            better = tk < bts[q]
                            bts[q] = jnp.where(better, tk, bts[q])
                            bps[q] = jnp.where(better, off + base + k, bps[q])
                    elif ty == PRIM_BOX:
                        ao = _vsub(a, o)
                        bo = _vsub(b, o)
                        for q in range(3):
                            ri = rinvs[q]
                            t1x, t2x = ao[0] * ri[0], bo[0] * ri[0]
                            t1y, t2y = ao[1] * ri[1], bo[1] * ri[1]
                            t1z, t2z = ao[2] * ri[2], bo[2] * ri[2]
                            tmin = jnp.maximum(
                                jnp.maximum(jnp.minimum(t1x, t2x),
                                            jnp.minimum(t1y, t2y)),
                                jnp.minimum(t1z, t2z))
                            tmax = jnp.minimum(
                                jnp.minimum(jnp.maximum(t1x, t2x),
                                            jnp.maximum(t1y, t2y)),
                                jnp.maximum(t1z, t2z))
                            tk = jnp.where((tmax >= tmin) & (tmin >= 0.0),
                                           tmin, _BIG)
                            better = tk < bts[q]
                            bts[q] = jnp.where(better, tk, bts[q])
                            bps[q] = jnp.where(better, off + base + k, bps[q])
                    else:
                        c = (chunk[k, 7], chunk[k, 8], chunk[k, 9])
                        e1 = _vsub(b, a)
                        e2 = _vsub(c, a)
                        tv = _vsub(o, a)
                        qv = _vcross(tv, e1)
                        e2qv = _vdot(e2, qv)
                        for q in range(3):
                            d = ds[q]
                            pv = _vcross(d, e2)
                            det = _vdot(e1, pv)
                            idet = 1.0 / jnp.where(det == 0.0, 1.0, det)
                            u = _vdot(tv, pv) * idet
                            vq = _vdot(d, qv) * idet
                            t = e2qv * idet
                            ok = (
                                (det != 0.0)
                                & (u >= 0.0)
                                & (u <= 1.0)
                                & (vq >= 0.0)
                                & (u + vq <= 1.0)
                                & (t > 0.0)
                            )
                            tk = jnp.where(ok, t, _BIG)
                            better = tk < bts[q]
                            bts[q] = jnp.where(better, tk, bts[q])
                            bps[q] = jnp.where(better, off + base + k, bps[q])
                return (bts[0], bts[1], bts[2], bps[0], bps[1], bps[2])

            if cull:
                hit = (_cluster_hit(chunk, o, rinvs[0], bts[0])
                       | _cluster_hit(chunk, o, rinvs[1], bts[1])
                       | _cluster_hit(chunk, o, rinvs[2], bts[2]))
                if live is not None:
                    hit = hit & live
                return jax.lax.cond(jnp.any(hit), work, lambda c_: c_,
                                    tuple(bts) + tuple(bps))
            return work(tuple(bts) + tuple(bps))

        out = _stream_chunks(
            entry, (bts[0], bts[1], bts[2], bps[0], bps[1], bps[2]), body
        )
        bts = [out[0], out[1], out[2]]
        bps = [out[3], out[4], out[5]]
    return tuple((bts[q] < T_MAX, bps[q], bts[q]) for q in range(3))


def _fetch_stream(tbls, idx, spec):
    """fetch() by per-lane winner id against the chunked tables: stream
    every chunk, masked-select the matching rows' columns.

    Deliberately NO whole-tile chunk skipping here: a lax.cond carrying
    the ~15 output arrays lowers to per-chunk copies of the whole carry
    (measured 100x slower on mesh0); the unconditional masked select chain
    is bandwidth-trivial VPU work."""
    cols = _spec_cols(spec)
    outs = tuple(jnp.zeros(TILE) for _ in cols)
    for entry in tbls:
        off = entry[2]

        def body(chunk, base, outs, off=off):
            local = idx - (off + base)
            for k in range(PCHUNK):
                m = local == k
                outs = tuple(
                    jnp.where(m, chunk[k, c], ov) for c, ov in zip(cols, outs)
                )
            return outs

        outs = _stream_chunks(entry, outs, body)
    return _spec_to_dict(spec, list(outs))


def _build_kernel_stream(shapes, M, T, L, num_lights, options, debug=False,
                         one_bounce=False, hbm=(False, False, False),
                         atlas_rows=0):
    """Streaming-kernel builder. shapes: ((Psph, Pbox, Ptri)) static row
    counts of the MegaPack tables (0 = table absent, not passed).
    hbm: per-type flags — True means that table arrives in HBM
    (memory_space=ANY) and is walked via DMA slabs (_stream_chunks); its
    (2, SLAB_ROWS, MEGA_W) scratch + DMA semaphore pair arrive as
    trailing scratch refs in table order.

    one_bounce=True builds the WAVEFRONT step kernel instead: the full
    per-ray carry (o, d, T, L, prev_spec, alive, prim, t) enters and
    leaves as arrays and the bounce index arrives as a (1,1) scalar
    input, so the host can re-SORT rays between bounces (Morton order on
    the shading vertex) — sorted tiles make the per-chunk cluster cull
    effective, which whole-path-in-VMEM execution cannot (incoherent
    lanes union-hit every cluster; PERF.md r3). Identical per-ray math:
    `body` below is shared verbatim with the monolithic kernel."""
    import jax.experimental.pallas as pl

    mb = options.max_bounces
    swapped_mis = options.swapped_light_mis_weight
    shading_gate = options.shading_normal_le_gate
    origin_pdf = options.origin_distance_pdf
    fetch = _fetch_from

    Psph, Pbox, Ptri = shapes
    type_info = []  # (ptype, ref argument position, offset, is_hbm)
    off = 0
    for (ty, n), is_h in zip(
        ((PRIM_SPHERE, Psph), (PRIM_BOX, Pbox), (PRIM_TRIANGLE, Ptri)), hbm
    ):
        if n:
            type_info.append((ty, len(type_info), off, is_h))
            off += n
    n_hbm = sum(1 for *_x, is_h in type_info if is_h)

    def _env(prim_refs, mat_ref, tex_ref, light_ref, scratches):
        # scratches: [(scratch, sem)] in table order, HBM tables only
        sit = iter(scratches)
        tbls = [
            (ty, prim_refs[pos], toff, next(sit) if is_h else None)
            for ty, pos, toff, is_h in type_info
        ]
        # small tables preloaded as scalar rows (loop-invariant)
        mat_tbl = [tuple(mat_ref[k, c] for c in range(11)) for k in range(M)]
        tex_cols = 12 if atlas_rows else 9
        tex_tbl = [tuple(tex_ref[k, c] for c in range(tex_cols))
                   for k in range(T)]
        light_tbl = [tuple(light_ref[k, c] for c in range(8)) for k in range(L)]

        # per-light carrier rows: light col 7 holds the REMAPPED prim id
        # (MegaPack.light_prim); one dynamic row read per light per table,
        # range-selected across tables. L is small, this runs once.
        carrier_tbl = []
        for l in range(L):
            cid = jnp.maximum(light_tbl[l][7].astype(jnp.int32), 0)
            vals = None
            for ty, pos, toff, is_h in type_info:
                ref = prim_refs[pos]
                n = ref.shape[0]
                loc = jnp.clip(cid - toff, 0, n - 1)
                if is_h:
                    # HBM ref: no direct indexing — DMA a sublane-aligned
                    # 8-row window into the table's slab scratch (runs
                    # once, pre-walk) and pick the row out of it
                    from jax.experimental.pallas import tpu as pltpu

                    scratch, sem = tbls[pos][3]
                    loc8 = (loc // 8) * 8
                    cp = pltpu.make_async_copy(
                        ref.at[pl.ds(loc8, 8), :],
                        scratch.at[0, pl.ds(0, 8), :],
                        sem.at[0],
                    )
                    cp.start()
                    cp.wait()
                    row = scratch[0, pl.ds(loc - loc8, 1), :]
                else:
                    row = ref[pl.ds(loc, 1), :]
                sc = tuple(row[0, c] for c in range(28))
                if vals is None:
                    vals = sc
                else:
                    inr = (cid >= toff) & (cid < toff + n)
                    vals = tuple(jnp.where(inr, s, v) for s, v in zip(sc, vals))
            carrier_tbl.append(vals)
        return tbls, mat_tbl, tex_tbl, light_tbl, carrier_tbl

    def _mk_body(tbls, mat_tbl, tex_tbl, light_tbl, carrier_tbl, u_at,
                 dbg_refs, atlas_tiles=None):
        zero = jnp.zeros(TILE)
        one = jnp.ones(TILE)
        def body(i, carry):
            (o, d, T_, Lrad, prev_spec_f, alive_f, prim, t) = carry
            prev_spec = prev_spec_f != 0.0
            alive = alive_f != 0.0
            found = t < T_MAX
            u = [u_at(i, j) for j in range(12)]

            rows = _fetch_stream(tbls, prim, {
                "ptype": 0, "a": (1, 2, 3), "b": (4, 5, 6), "c": (7, 8, 9),
                "uv0": (19, 20), "uv1": (21, 22), "uv2": (23, 24),
                "material": 25, "light": 26,
            })
            rows["ptype"] = rows["ptype"].astype(jnp.int32)
            p, norm, uv, dpdu = _hit_detail(rows, o, d, t, found)
            cur = alive & found
            wwo = _vneg(d)
            mid = rows["material"].astype(jnp.int32)
            mrows = fetch(mat_tbl, mid, {
                "mtype": 0, "color": (1, 2, 3), "tex": 4,
                "eta": (5, 6, 7), "k": (8, 9, 10),
            })
            mrows["mtype"] = mrows["mtype"].astype(jnp.int32)
            tid = jnp.maximum(mrows["tex"].astype(jnp.int32), 0)
            tex_spec = {
                "ttype": 0, "c0": (1, 2, 3), "c1": (4, 5, 6),
                "scale": 7, "line": 8,
            }
            if atlas_tiles is not None:
                tex_spec.update({"img_ofs": 9, "img_w": 10, "img_h": 11})
            trows = fetch(tex_tbl, tid, tex_spec)
            albedo = _eval_albedo(mrows, trows, uv, atlas_tiles)
            mrows["albedo"] = albedo
            frame = _make_frame(norm, dpdu)

            # emitted light at the vertex (first or post-specular only)
            emit_gate = (i == 0) | prev_spec
            lid_own = jnp.maximum(rows["light"].astype(jnp.int32), 0)
            own = fetch(light_tbl, lid_own, {"intensity": (4, 5, 6)})
            has_own = rows["light"] >= 0.0
            le_gate0 = _vdot(norm, wwo) > 0.0
            g = cur & emit_gate & has_own & le_gate0
            Lrad = _vadd(Lrad, _vwhere(g, _vmul(T_, own["intensity"]),
                                       (zero, zero, zero)))

            # next-event estimation: pick one light uniformly
            li = jnp.minimum(
                jnp.floor(u[0] * num_lights).astype(jnp.int32), num_lights - 1
            )
            lrows = fetch(light_tbl, li, {
                "ltype": 0, "pos": (1, 2, 3), "intensity": (4, 5, 6),
                "prim": 7,
            })
            lrows["ltype"] = lrows["ltype"].astype(jnp.int32)
            carrier = fetch(carrier_tbl, li, {
                "ptype": 0, "a": (1, 2, 3), "b": (4, 5, 6), "c": (7, 8, 9),
                "n0": (10, 11, 12), "n1": (13, 14, 15), "n2": (16, 17, 18),
                "area": 27,
            })
            carrier["ptype"] = carrier["ptype"].astype(jnp.int32)
            ls = _sample_light(lrows, carrier, p, u[1], u[2], u[3], u[4],
                               origin_pdf)
            bs_nee = _bsdf_sample(frame, mrows, wwo, u[5], u[6], u[7],
                                  non_specular_only=True)
            bs = _bsdf_sample(frame, mrows, wwo, u[9], u[10], u[11],
                              non_specular_only=False)

            # three closest-hit queries (shadow | nee-bsdf | extension) in
            # ONE shared stream over the tables, live-masked so dead
            # lanes' stale rays don't defeat the cull
            (sf, sp_, _st), (nf, np_, _nt), (xf, xp, xt) = _closest_stream3(
                tbls, p, ls["wi"], bs_nee["wwi"], bs["wwi"], live=cur
            )
            svals = _fetch_stream(tbls, sp_, {"light": 26})
            nvals = _fetch_stream(tbls, np_, {"light": 26})
            s_hits = svals["light"].astype(jnp.int32) == li
            n_hits = nvals["light"].astype(jnp.int32) == li

            # ---- NEE assembly (identical to _build_kernel; bs_nee is the
            # BSDF-strategy sample, bs only drives the extension) ----
            f = _bsdf_F_nee(mrows["mtype"], albedo, norm, wwo, ls["wi"])
            unoccl = (~sf) | ((~ls["is_delta"]) & s_hits)
            b_pdf = _bsdf_pdf_nee(frame, mrows["mtype"], wwo, ls["wi"])
            # finite-by-construction weight math: matches the XLA
            # integrator's clipped pdfs exactly (integrator.py)
            bp = jnp.clip(b_pdf, 1e-12, 1e9)
            lp = jnp.clip(ls["pdf"], 1e-12, 1e9)
            if swapped_mis:
                w = bp * bp / (bp * bp + lp * lp)
            else:
                w = lp * lp / (bp * bp + lp * lp)
            w = jnp.where((b_pdf == 0.0) & (ls["pdf"] == 0.0), 0.0, w)
            w = jnp.where(ls["is_delta"], 1.0, w)
            gate_l = (
                (ls["pdf"] > 0.0)
                & (_vdot(ls["Li"], ls["Li"]) > 0.0)
                & (_vdot(f, f) > 0.0)
                & unoccl
            )
            scale_l = jnp.abs(_vdot(ls["wi"], norm)) * w / lp
            scale_l = jnp.where(gate_l, scale_l, 0.0)
            contrib_l = _vwhere(
                gate_l, _vscale(_vmul(f, ls["Li"]), scale_l),
                (zero, zero, zero),
            )

            l_pdf2 = jnp.where(
                lrows["ltype"] == 1,  # LIGHT_AREA
                _surface_pdf(carrier, p, bs_nee["wwi"], origin_pdf),
                0.0,
            )
            bp2 = jnp.clip(bs_nee["pdf"], 1e-12, 1e9)
            lp2c = jnp.clip(l_pdf2, 1e-12, 1e9)
            w2 = bp2 * bp2 / (bp2 * bp2 + lp2c * lp2c)
            w2 = jnp.where((bs_nee["pdf"] == 0.0) & (l_pdf2 == 0.0), 0.0, w2)
            w2 = jnp.where(bs_nee["is_specular"], 1.0, w2)
            if shading_gate:
                le_gate = _vdot(norm, _vneg(bs_nee["wwi"])) > 0.0
            else:
                nrows = _fetch_stream(tbls, np_, {
                    "ptype": 0, "a": (1, 2, 3), "b": (4, 5, 6), "c": (7, 8, 9),
                })
                nrows["ptype"] = nrows["ptype"].astype(jnp.int32)
                ts_n = jnp.where(nf, _nt, 0.0)
                hp_n = _vadd(p, _vscale(bs_nee["wwi"], ts_n))
                nee_norm = _detail_norm(nrows, hp_n, p, bs_nee["wwi"])
                le_gate = _vdot(nee_norm, _vneg(bs_nee["wwi"])) > 0.0
            same_light = nf & n_hits
            Li2 = _vwhere(same_light & le_gate, lrows["intensity"],
                          (zero, zero, zero))
            gate_b = (
                (~ls["is_delta"])
                & (_vdot(bs_nee["f"], bs_nee["f"]) > 0.0)
                & (bs_nee["pdf"] > 0.0)
                & (bs_nee["is_specular"] | (l_pdf2 != 0.0))
                & nf
                & (_vdot(Li2, Li2) > 0.0)
            )
            scale_b = jnp.abs(_vdot(bs_nee["wwi"], norm)) * w2 / bp2
            scale_b = jnp.where(gate_b, scale_b, 0.0)
            contrib_b = _vwhere(
                gate_b, _vscale(_vmul(bs_nee["f"], Li2), scale_b),
                (zero, zero, zero),
            )
            Ld = _vadd(contrib_l, contrib_b)
            Lrad = _vadd(
                Lrad,
                _vwhere(cur, _vscale(_vmul(T_, Ld), float(num_lights)),
                        (zero, zero, zero)),
            )

            # throughput update + path termination
            ok = (_vdot(bs["f"], bs["f"]) > 0.0) & (bs["pdf"] > 0.0)
            alive_next = cur & ok & (i <= mb - 2)
            # clamped weight/product (1e12 / 1e16): keeps deep
            # degenerate-frame chains f32-finite; matches the XLA
            # integrator's throughput clamp exactly (integrator.py)
            tscale = (jnp.abs(_vdot(bs["wwi"], norm))
                      / jnp.clip(bs["pdf"], 1e-12, 1e9))
            w_b = tuple(jnp.minimum(fc * tscale, 1.0e12) for fc in bs["f"])
            T_next = tuple(
                jnp.minimum(tc * wc, 1.0e16) for tc, wc in zip(T_, w_b)
            )
            T_ = _vwhere(alive_next, T_next, T_)

            if debug:
                dbg = dbg_refs[0]
                ch = [t, prim.astype(jnp.float32),
                      jnp.maximum(jnp.maximum(T_[0], T_[1]), T_[2]),
                      bs["pdf"], _vdot(bs["f"], bs["f"]),
                      ls["pdf"], l_pdf2,
                      Ld[0] + Ld[1] + Ld[2],
                      jnp.where(cur, 1.0, 0.0),
                      xt, xp.astype(jnp.float32),
                      jnp.where(bs["is_specular"], 1.0, 0.0)]
                for c, v in enumerate(ch):
                    dbg[i * DBG_C + c, :, :] = v
            return (p, bs["wwi"], T_, Lrad,
                    jnp.where(bs["is_specular"], 1.0, 0.0),
                    jnp.where(alive_next, 1.0, 0.0),
                    xp, jnp.where(xf, xt, _BIG))
        return body

    def _split_scratch(refs):
        # scratch refs (scratch, sem per HBM table) trail the outputs
        if not n_hbm:
            return refs, []
        tail = refs[len(refs) - 2 * n_hbm :]
        return refs[: len(refs) - 2 * n_hbm], [
            (tail[2 * i], tail[2 * i + 1]) for i in range(n_hbm)
        ]

    def kernel(*refs):
        ntab = len(type_info)
        refs, scratches = _split_scratch(refs)
        prim_refs = refs[:ntab]
        mat_ref, tex_ref, light_ref = refs[ntab : ntab + 3]
        atlas_tiles = refs[ntab + 3 : ntab + 6] if atlas_rows else None
        na = 3 if atlas_rows else 0
        oxr, oyr, ozr, dxr, dyr, dzr, u_ref = refs[
            ntab + 3 + na : ntab + 10 + na]
        lxr, lyr, lzr = refs[ntab + 10 + na : ntab + 13 + na]
        dbg_refs = refs[ntab + 13 + na :]

        tbls, mat_tbl, tex_tbl, light_tbl, carrier_tbl = _env(
            prim_refs, mat_ref, tex_ref, light_ref, scratches)
        o0 = (oxr[:, :], oyr[:, :], ozr[:, :])
        d0 = (dxr[:, :], dyr[:, :], dzr[:, :])
        zero = jnp.zeros(TILE)
        one = jnp.ones(TILE)

        def u_at(i, j):
            return u_ref[pl.ds(i * 12 + j, 1), :, :].reshape(TILE)

        # primary hit in-kernel (the unrolled kernel takes it as an input;
        # here one more streamed query is cheaper than a separate dispatch)
        f0, prim0, t0 = _closest_stream(tbls, o0, d0)
        t0 = jnp.where(f0, t0, _BIG)

        body = _mk_body(tbls, mat_tbl, tex_tbl, light_tbl,
                        carrier_tbl, u_at, dbg_refs, atlas_tiles)
        init = (o0, d0, (one, one, one), (zero, zero, zero), zero, one,
                prim0, t0)
        carry = jax.lax.fori_loop(0, mb, body, init)
        Lrad = carry[3]
        lxr[:, :] = Lrad[0]
        lyr[:, :] = Lrad[1]
        lzr[:, :] = Lrad[2]

    def kernel_ob(*refs):
        # WAVEFRONT step: one bounce over an externally-sorted carry
        ntab = len(type_info)
        refs, scratches = _split_scratch(refs)
        prim_refs = refs[:ntab]
        mat_ref, tex_ref, light_ref, i_ref = refs[ntab : ntab + 4]
        atlas_tiles = refs[ntab + 4 : ntab + 7] if atlas_rows else None
        na = 3 if atlas_rows else 0
        (oxr, oyr, ozr, dxr, dyr, dzr, txr, tyr, tzr, lxr0, lyr0, lzr0,
         psr, avr, pr, tr, u_ref) = refs[ntab + 4 + na : ntab + 21 + na]
        (oxo, oyo, ozo, dxo, dyo, dzo, txo, tyo, tzo, lxo, lyo, lzo,
         pso, avo, po, to) = refs[ntab + 21 + na :]

        tbls, mat_tbl, tex_tbl, light_tbl, carrier_tbl = _env(
            prim_refs, mat_ref, tex_ref, light_ref, scratches)

        def u_at(i, j):
            return u_ref[pl.ds(j, 1), :, :].reshape(TILE)

        body = _mk_body(tbls, mat_tbl, tex_tbl, light_tbl, carrier_tbl,
                        u_at, (), atlas_tiles)
        iv = i_ref[0, 0]
        carry = (
            (oxr[:, :], oyr[:, :], ozr[:, :]),
            (dxr[:, :], dyr[:, :], dzr[:, :]),
            (txr[:, :], tyr[:, :], tzr[:, :]),
            (lxr0[:, :], lyr0[:, :], lzr0[:, :]),
            psr[:, :], avr[:, :], pr[:, :], tr[:, :],
        )
        (o_n, d_n, T_n, L_n, ps_n, av_n, p_n, t_n) = body(iv, carry)
        oxo[:, :], oyo[:, :], ozo[:, :] = o_n[0], o_n[1], o_n[2]
        dxo[:, :], dyo[:, :], dzo[:, :] = d_n[0], d_n[1], d_n[2]
        txo[:, :], tyo[:, :], tzo[:, :] = T_n[0], T_n[1], T_n[2]
        lxo[:, :], lyo[:, :], lzo[:, :] = L_n[0], L_n[1], L_n[2]
        pso[:, :] = ps_n
        avo[:, :] = av_n
        po[:, :] = p_n
        to[:, :] = t_n

    if one_bounce:
        assert not debug, "one-bounce wavefront kernel has no debug mode"
        return kernel_ob
    return kernel


@functools.partial(
    jax.jit, static_argnames=("M", "T", "L", "num_lights", "options",
                              "interpret", "debug", "atlas_rows")
)
def _megakernel_call_stream(prim_tbls, mat, tex, light, atl, ox, oy, oz,
                            dx, dy, dz, u, M, T, L, num_lights, options,
                            interpret=False, debug=False, atlas_rows=0):
    import jax.experimental.pallas as pl

    from jax.experimental.pallas import tpu as pltpu

    Bs = ox.shape[0]
    mb = options.max_bounces
    shapes = tuple(
        t.shape[0] if t is not None and t.shape[0] else 0 for t in prim_tbls
    )
    hbm = tuple(n >= HBM_MIN_ROWS for n in shapes)
    present = [t for t in prim_tbls if t is not None and t.shape[0]]
    present_hbm = [h for t, h in zip(prim_tbls, hbm)
                   if t is not None and t.shape[0]]
    kernel = _build_kernel_stream(shapes, M, T, L, num_lights, options,
                                  debug=debug, hbm=hbm,
                                  atlas_rows=atlas_rows)
    ray_spec = pl.BlockSpec((32, 128), lambda i: (i, 0))
    table_spec = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0))
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    atl_in = list(atl) if atlas_rows else []
    u_spec = pl.BlockSpec((u.shape[0], 32, 128), lambda i: (0, i, 0))
    out_spec = pl.BlockSpec((32, 128), lambda i: (i, 0))
    out_specs = [out_spec] * 3
    out_shape = [jax.ShapeDtypeStruct((Bs, 128), jnp.float32)] * 3
    if debug:
        out_specs.append(
            pl.BlockSpec((mb * DBG_C, 32, 128), lambda i: (0, i, 0))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((mb * DBG_C, Bs, 128), jnp.float32)
        )
    scratch_shapes = []
    for h in present_hbm:
        if h:
            scratch_shapes += [
                pltpu.VMEM((2, SLAB_ROWS, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
    outs = pl.pallas_call(
        kernel,
        grid=(Bs // 32,),
        in_specs=[hbm_spec if h else table_spec(t)
                  for t, h in zip(present, present_hbm)]
        + [table_spec(mat), table_spec(tex), table_spec(light)]
        + [table_spec(p) for p in atl_in]
        + [ray_spec] * 6 + [u_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*present, mat, tex, light, *atl_in, ox, oy, oz, dx, dy, dz, u)
    return outs


def _megakernel_call_stream_onebounce(prim_tbls, mat, tex, light, atl, iv,
                                      carry, u, M, T, L, num_lights, options,
                                      interpret=False, atlas_rows=0):
    """One WAVEFRONT bounce. carry: 16 (Bs, 128) arrays
    [ox oy oz dx dy dz Tx Ty Tz Lx Ly Lz prev_spec alive prim(i32) t];
    iv: (1,1) i32 bounce index; u: (12, Bs, 128). Returns the 16-array
    next carry."""
    import jax.experimental.pallas as pl

    from jax.experimental.pallas import tpu as pltpu

    Bs = carry[0].shape[0]
    shapes = tuple(
        t.shape[0] if t is not None and t.shape[0] else 0 for t in prim_tbls
    )
    hbm = tuple(n >= HBM_MIN_ROWS for n in shapes)
    present = [t for t in prim_tbls if t is not None and t.shape[0]]
    present_hbm = [h for t, h in zip(prim_tbls, hbm)
                   if t is not None and t.shape[0]]
    kernel = _build_kernel_stream(shapes, M, T, L, num_lights, options,
                                  one_bounce=True, hbm=hbm,
                                  atlas_rows=atlas_rows)
    ray_spec = pl.BlockSpec((32, 128), lambda i: (i, 0))
    table_spec = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0))
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    atl_in = list(atl) if atlas_rows else []
    u_spec = pl.BlockSpec((12, 32, 128), lambda i: (0, i, 0))
    dt = [jnp.float32] * 14 + [jnp.int32, jnp.float32]
    scratch_shapes = []
    for h in present_hbm:
        if h:
            scratch_shapes += [
                pltpu.VMEM((2, SLAB_ROWS, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
    outs = pl.pallas_call(
        kernel,
        grid=(Bs // 32,),
        in_specs=[hbm_spec if h else table_spec(t)
                  for t, h in zip(present, present_hbm)]
        + [table_spec(mat), table_spec(tex), table_spec(light),
           table_spec(iv)]
        + [table_spec(p) for p in atl_in]
        + [ray_spec] * 16 + [u_spec],
        out_specs=[ray_spec] * 16,
        out_shape=[jax.ShapeDtypeStruct((Bs, 128), t) for t in dt],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*present, mat, tex, light, iv, *atl_in, *carry, u)
    return outs


def _morton_key(p, lo, hi):
    """(B,) int32 Morton code of positions p within [lo, hi] (10 bits per
    axis) — the wavefront sort key."""
    g = jnp.clip((p - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
    xyz = (g * 1023.0).astype(jnp.uint32)

    def spread(v):
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    code = (
        spread(xyz[:, 0]) | (spread(xyz[:, 1]) << 1)
        | (spread(xyz[:, 2]) << 2)
    )
    return code.astype(jnp.int32)


def _ray_color_stream_wavefront(scene, tables, o, d, key, options,
                                interpret=False):
    """WAVEFRONT dispatch for P > MAX_P scenes: per-bounce Morton sorting
    of the ray carry so the one-bounce stream kernel sees spatially
    coherent (32, 128) tiles — which is what makes the per-chunk cluster
    cull (and dead-lane tile skipping) actually pay; the monolithic
    all-bounces-in-VMEM kernel cannot reorder across tiles and measured
    the cull as a wash on incoherent tiles (PERF.md r3).

    Per-ray math is identical to the monolithic stream kernel (the bounce
    body is shared verbatim) and uniforms travel WITH their ray through
    the sorts, so results match the XLA path the same way the monolithic
    kernel does."""
    B = o.shape[0]
    mb = options.max_bounces
    num_lights = scene.light_type.shape[0]
    M = tables.mat.shape[0]
    T = tables.tex.shape[0]
    L = tables.light.shape[0]
    mega = scene.prims_mega
    light_tbl = tables.light.at[:, 7].set(mega.light_prim.astype(jnp.float32))
    prim_tbls = tuple(
        t if t.shape[0] else None for t in (mega.sph, mega.box, mega.tri)
    )
    atl, atlas_rows = _atlas_planes(scene)

    B_pad = -(-B // RAY_TILE) * RAY_TILE
    pad = B_pad - B
    padf = lambda x, v=0.0: jnp.pad(x, (0, pad), constant_values=v)

    # uniforms per (bounce, slot, ray) — gathered through the sorts so
    # each ray draws exactly what the XLA path would draw for it
    us = jnp.stack(
        [jax.random.uniform(jax.random.fold_in(key, i), (B, 12))
         for i in range(mb)]
    )  # (mb, B, 12)
    us = jnp.pad(us, ((0, 0), (0, pad), (0, 0)))

    from plutracer_tpu.ops import intersect

    found0, prim0, t0 = intersect.query_lite(scene, o, d, options)
    prim_mega0 = mega.scene_to_mega[jnp.maximum(prim0, 0)]
    t0 = jnp.where(found0, t0, _BIG)

    # flat (B_pad,) carry columns
    st = {
        "ox": padf(o[:, 0]), "oy": padf(o[:, 1]), "oz": padf(o[:, 2]),
        "dx": padf(d[:, 0], 1.0), "dy": padf(d[:, 1], 1.0),
        "dz": padf(d[:, 2], 1.0),
        "Tx": padf(jnp.ones(B)), "Ty": padf(jnp.ones(B)),
        "Tz": padf(jnp.ones(B)),
        "Lx": padf(jnp.zeros(B)), "Ly": padf(jnp.zeros(B)),
        "Lz": padf(jnp.zeros(B)),
        "ps": padf(jnp.zeros(B)),
        "av": padf(jnp.ones(B)),  # padding lanes: t=_BIG keeps them inert
        "prim": padf(prim_mega0, 0).astype(jnp.int32),
        "t": padf(t0, _BIG),
    }
    order = ["ox", "oy", "oz", "dx", "dy", "dz", "Tx", "Ty", "Tz",
             "Lx", "Ly", "Lz", "ps", "av", "prim", "t"]
    orig = jnp.arange(B_pad, dtype=jnp.int32)

    # scene bounds for the Morton grid (cheap (P,) reductions)
    lo = jnp.minimum(
        jnp.min(scene.prim_a, 0),
        jnp.minimum(jnp.min(scene.prim_b, 0), jnp.min(scene.prim_c, 0)),
    )
    hi = jnp.maximum(
        jnp.max(scene.prim_a, 0),
        jnp.maximum(jnp.max(scene.prim_b, 0), jnp.max(scene.prim_c, 0)),
    )

    sort_mode = getattr(options, "stream_sort", "morton")
    for i in range(mb):
        # reorder so dead/missed lanes pack into whole-dead tiles (the
        # per-tile cull then skips every chunk for them) and, in morton
        # mode, live lanes cluster by shading-vertex locality. Bounce 0
        # is skipped: camera rays arrive pixel-ordered (already coherent).
        if i > 0 and sort_mode != "none":
            live = (st["av"] != 0.0) & (st["t"] < T_MAX)
            if sort_mode in ("morton", "morton5"):
                ox = jnp.stack([st["ox"], st["oy"], st["oz"]], -1)
                keym = _morton_key(ox, lo, hi)
                if sort_mode == "morton5":
                    # direction-aware key: 3 octant bits ahead of a
                    # 27-bit origin Morton. Origin-only sorting buys no
                    # cull coherence (diffuse bounce directions are
                    # isotropic, so origin-sorted tiles still union-hit
                    # every cluster — PERF.md r4); octant-major grouping
                    # gives each (32,128) tile a shared direction cone,
                    # which lets the per-chunk cluster cull reject the
                    # half-space behind the tile.
                    dv = [st["dx"], st["dy"], st["dz"]]
                    octant = (
                        (dv[0] >= 0.0).astype(jnp.int32) * 4
                        + (dv[1] >= 0.0).astype(jnp.int32) * 2
                        + (dv[2] >= 0.0).astype(jnp.int32)
                    )
                    keym = (octant << 27) | (keym >> 3)
                keym = jnp.where(live, keym, jnp.int32(2**30))
                perm = jnp.argsort(keym)
            else:  # "compact": cumsum stable partition (no full sort)
                n_alive = jnp.sum(live.astype(jnp.int32))
                pos = jnp.where(
                    live,
                    jnp.cumsum(live.astype(jnp.int32)) - 1,
                    n_alive + jnp.cumsum((~live).astype(jnp.int32)) - 1,
                )
                perm = jnp.zeros(B_pad, jnp.int32).at[pos].set(
                    jnp.arange(B_pad, dtype=jnp.int32)
                )
            st = {k: v[perm] for k, v in st.items()}
            orig = orig[perm]
        u_i = us[i][orig]  # (B_pad, 12) — uniforms follow their ray

        carry = [st[k].reshape(B_pad // 128, 128) for k in order]
        u_k = u_i.T.reshape(12, B_pad // 128, 128)
        outs = _megakernel_call_stream_onebounce(
            prim_tbls, tables.mat, tables.tex, light_tbl, atl,
            jnp.full((1, 1), i, jnp.int32), carry, u_k,
            M=M, T=T, L=L, num_lights=num_lights, options=options,
            interpret=interpret, atlas_rows=atlas_rows,
        )
        st = {k: v.reshape(-1) for k, v in zip(order, outs)}

    # radiance back to the original ray order
    L_out = jnp.zeros((B_pad, 3))
    L_out = L_out.at[orig].set(
        jnp.stack([st["Lx"], st["Ly"], st["Lz"]], -1)
    )
    return L_out[:B]


def ray_color_pallas(scene, o, d, key, options, interpret: bool = False,
                     unroll: bool = False, debug: bool = False):
    """Drop-in for render/integrator.py::ray_color on eligible scenes.

    Draws the exact uniforms the XLA path would (one (B, 12) block per
    bounce from fold_in(key, bounce)), then runs every bounce in one
    Pallas program. Scenes up to MAX_P primitives use the fully-unrolled
    kernel (primary hit computed with the standard backend-dispatched
    query); larger scenes use the STREAMING kernel over the MegaPack
    tables (primary hit in-kernel). NOTE: `unroll=True` only affects the
    small-scene kernel's bounce loop — when P > MAX_P the streaming
    kernel is selected regardless and the flag is ignored (its bounce
    loop is always a fori_loop; per-bounce unrolling would multiply the
    already-dominant chunk-stream program body by max_bounces).
    """
    from plutracer_tpu.ops import intersect
    from plutracer_tpu.ops.tables import pack_tables

    B = o.shape[0]
    mb = options.max_bounces
    num_lights = scene.light_type.shape[0]
    tables = pack_tables(scene)
    P = tables.prim.shape[0]
    M = tables.mat.shape[0]
    T = tables.tex.shape[0]
    L = tables.light.shape[0]
    stream = P > MAX_P
    if (stream and not debug
            and getattr(options, "stream_wavefront", False)):
        # OPT-IN per-bounce WAVEFRONT dispatch for big-P scenes
        # (options.stream_wavefront=True). The default stays the
        # monolithic stream kernel: PERF.md r4 measured every reorder
        # strategy (Morton sort, compaction, no-op) as a net loss on
        # diffuse bounces. The wavefront path remains the base for
        # HBM-streamed tables beyond the VMEM prim ceiling.
        return _ray_color_stream_wavefront(
            scene, tables, o, d, key, options, interpret=interpret
        )

    us = jnp.stack(
        [
            jax.random.uniform(jax.random.fold_in(key, i), (B, 12))
            for i in range(mb)
        ]
    )  # (mb, B, 12)

    B_pad = -(-B // RAY_TILE) * RAY_TILE
    pad = B_pad - B
    Bs = B_pad // 128

    def comp(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(Bs, 128)

    ox, oy, oz = comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2])
    dx, dy, dz = (
        comp(d[:, 0], 1.0), comp(d[:, 1], 1.0), comp(d[:, 2], 1.0),
    )
    u = (
        jnp.pad(
            us.transpose(0, 2, 1).reshape(mb * 12, B), ((0, 0), (0, pad))
        ).reshape(mb * 12, Bs, 128)
    )

    if stream:
        mega = scene.prims_mega
        # the kernel reads the carrier prim id from light col 7: remap it
        # into the MegaPack's permuted index space
        light_tbl = tables.light.at[:, 7].set(
            mega.light_prim.astype(jnp.float32)
        )
        prim_tbls = tuple(
            t if t.shape[0] else None for t in (mega.sph, mega.box, mega.tri)
        )
        atl, atlas_rows = _atlas_planes(scene)
        res = _megakernel_call_stream(
            prim_tbls, tables.mat, tables.tex, light_tbl, atl,
            ox, oy, oz, dx, dy, dz, u,
            M=M, T=T, L=L, num_lights=num_lights, options=options,
            interpret=interpret, debug=debug, atlas_rows=atlas_rows,
        )
    else:
        found0, prim0, t0 = intersect.query_lite(scene, o, d, options)
        t0 = jnp.where(found0, t0, _BIG)
        p0 = comp(prim0.astype(jnp.float32)).astype(jnp.int32)
        t0r = comp(t0, _BIG)
        # static parent-AABB phantom cull (ops.bvh.parent_bounds_tables):
        # bounds ride a small dynamic table, row ids are static
        cull_rows = tuple(scene.cull_rows or ())
        if cull_rows:
            ridx = jnp.asarray(cull_rows, jnp.int32)
            cull_tbl = jnp.concatenate(
                [scene.parent_min[ridx], scene.parent_max[ridx]], axis=1
            )
        else:
            cull_tbl = jnp.zeros((1, 6), jnp.float32)
        # VMEM-pinned image atlas as three (R, 128) channel planes
        atl, atlas_rows = _atlas_planes(scene)
        res = _megakernel_call(
            tables.prim, tables.mat, tables.tex, tables.light, cull_tbl, atl,
            ox, oy, oz, dx, dy, dz, p0, t0r, u,
            P=P, M=M, T=T, L=L, num_lights=num_lights, options=options,
            interpret=interpret, unroll=unroll, debug=debug,
            cull_rows=cull_rows, atlas_rows=atlas_rows,
        )
    lx, ly, lz = res[0], res[1], res[2]
    out = jnp.stack(
        [lx.reshape(-1)[:B], ly.reshape(-1)[:B], lz.reshape(-1)[:B]], -1
    )
    if debug:
        from plutracer_tpu.ops.pallas.integrator_kernel import DBG_C as _C
        dbg = res[3].reshape(mb, _C, B_pad)[:, :, :B]
        return out, dbg
    return out

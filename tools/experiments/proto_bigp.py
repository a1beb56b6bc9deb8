"""Prototype: Mosaic patterns needed by the big-P megakernel.

Tests on the live TPU (and interpret mode):
 1. fori_loop over primitive chunks with dynamic-offset VMEM loads
    (prim_ref[pl.ds(c*8, :8), :]) + static scalar extracts per row;
 2. whole-tile cluster-AABB cull via lax.cond on a scalar any-reduction
    with (best_t, best_p) value carry;
 3. same but pl.when + VMEM scratch refs (fallback if cond lowers badly).

Run: python tools/proto_bigp.py [P] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 8


def make_table(P, key):
    """Random sphere table (P, 128): [cx cy cz r ...pad]."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    c = jax.random.uniform(k1, (P, 3), minval=-10, maxval=10)
    r = jax.random.uniform(k2, (P, 1), minval=0.1, maxval=0.5)
    tbl = jnp.zeros((P, 128), jnp.float32)
    tbl = tbl.at[:, 0:3].set(c).at[:, 3:4].set(r)
    # cluster AABBs in cols 8:14 (min, max) per chunk, broadcast to rows
    mins = (c - r).reshape(P // CHUNK, CHUNK, 3).min(1)
    maxs = (c + r).reshape(P // CHUNK, CHUNK, 3).max(1)
    tbl = tbl.at[:, 8:11].set(jnp.repeat(mins, CHUNK, 0))
    tbl = tbl.at[:, 11:14].set(jnp.repeat(maxs, CHUNK, 0))
    return tbl


def sphere_t(o, d, cx, cy, cz, r):
    vx, vy, vz = o[0] - cx, o[1] - cy, o[2] - cz
    qb = -(vx * d[0] + vy * d[1] + vz * d[2])
    det = qb * qb - (vx * vx + vy * vy + vz * vz) + r * r
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    i1, i2 = qb - sq, qb + sq
    return jnp.where((det >= 0.0) & (i1 > 0.0) & (i2 > 0.0), i1, 1e8)


def kernel_nocull(tbl_ref, ox, oy, oz, dx, dy, dz, t_ref, p_ref):
    import jax.experimental.pallas as pl

    o = (ox[:, :], oy[:, :], oz[:, :])
    d = (dx[:, :], dy[:, :], dz[:, :])
    P = tbl_ref.shape[0]

    def body(c, carry):
        bt, bp = carry
        base = pl.multiple_of(c * CHUNK, CHUNK)
        chunk = tbl_ref[pl.ds(base, CHUNK), :]
        for k in range(CHUNK):
            tk = sphere_t(o, d, chunk[k, 0], chunk[k, 1], chunk[k, 2],
                          chunk[k, 3])
            better = tk < bt
            bt = jnp.where(better, tk, bt)
            bp = jnp.where(better, base + k, bp)
        return bt, bp

    bt0 = jnp.full(ox.shape, 1e8)
    bp0 = jnp.zeros(ox.shape, jnp.int32)
    bt, bp = jax.lax.fori_loop(0, P // CHUNK, body, (bt0, bp0))
    t_ref[:, :] = bt
    p_ref[:, :] = bp


def kernel_cull(tbl_ref, ox, oy, oz, dx, dy, dz, t_ref, p_ref):
    import jax.experimental.pallas as pl

    o = (ox[:, :], oy[:, :], oz[:, :])
    d = (dx[:, :], dy[:, :], dz[:, :])
    P = tbl_ref.shape[0]
    rx = 1.0 / jnp.where(dx[:, :] == 0.0, 1e-20, dx[:, :])
    ry = 1.0 / jnp.where(dy[:, :] == 0.0, 1e-20, dy[:, :])
    rz = 1.0 / jnp.where(dz[:, :] == 0.0, 1e-20, dz[:, :])

    def body(c, carry):
        bt, bp = carry
        base = pl.multiple_of(c * CHUNK, CHUNK)
        chunk = tbl_ref[pl.ds(base, CHUNK), :]
        # cluster AABB slab test (scalar per chunk, broadcast to lanes)
        t1x, t2x = (chunk[0, 8] - o[0]) * rx, (chunk[0, 11] - o[0]) * rx
        t1y, t2y = (chunk[0, 9] - o[1]) * ry, (chunk[0, 12] - o[1]) * ry
        t1z, t2z = (chunk[0, 10] - o[2]) * rz, (chunk[0, 13] - o[2]) * rz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.minimum(t1z, t2z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                       jnp.maximum(t1y, t2y)),
                           jnp.maximum(t1z, t2z))
        hit = (tmax >= tmin) & (tmax >= 0.0) & (tmin < bt)

        def work(carry):
            bt, bp = carry
            for k in range(CHUNK):
                tk = sphere_t(o, d, chunk[k, 0], chunk[k, 1], chunk[k, 2],
                              chunk[k, 3])
                better = tk < bt
                bt = jnp.where(better, tk, bt)
                bp = jnp.where(better, base + k, bp)
            return bt, bp

        return jax.lax.cond(jnp.any(hit), work, lambda c_: c_, (bt, bp))

    bt0 = jnp.full(ox.shape, 1e8)
    bp0 = jnp.zeros(ox.shape, jnp.int32)
    bt, bp = jax.lax.fori_loop(0, P // CHUNK, body, (bt0, bp0))
    t_ref[:, :] = bt
    p_ref[:, :] = bp


def run(kern, tbl, rays, interpret=False):
    import jax.experimental.pallas as pl

    Bs = rays[0].shape[0]

    @jax.jit
    def go(tbl, *r):
        return pl.pallas_call(
            kern,
            grid=(Bs // 32,),
            in_specs=[pl.BlockSpec(tbl.shape, lambda i: (0, 0))]
            + [pl.BlockSpec((32, 128), lambda i: (i, 0))] * 6,
            out_specs=[pl.BlockSpec((32, 128), lambda i: (i, 0))] * 2,
            out_shape=[
                jax.ShapeDtypeStruct((Bs, 128), jnp.float32),
                jax.ShapeDtypeStruct((Bs, 128), jnp.int32),
            ],
            interpret=interpret,
        )(tbl, *r)

    return go(tbl, *rays)


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 1280
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    B = 262144
    tbl = make_table(P, 0)
    k = jax.random.PRNGKey(1)
    o = jax.random.uniform(k, (B, 3), minval=-12, maxval=12)
    d = jax.random.normal(jax.random.PRNGKey(2), (B, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    rays = tuple(x.reshape(B // 128, 128) for x in
                 (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]))

    # oracle: numpy brute force on a subset (a full (P, B) matrix on the
    # device is GBs and was the cause of the first run's timeout)
    NS = 8192
    on = np.asarray(o[:NS])
    dn = np.asarray(d[:NS])
    tn = np.asarray(tbl)
    v = on[None, :, :] - tn[:, None, 0:3]  # (P, NS, 3)
    qb = -(v * dn[None]).sum(-1)
    det = qb * qb - (v * v).sum(-1) + tn[:, None, 3] ** 2
    sq = np.sqrt(np.maximum(det, 0.0))
    i1, i2 = qb - sq, qb + sq
    ts = np.where((det >= 0.0) & (i1 > 0.0) & (i2 > 0.0), i1, 1e8)
    bt_ref = ts.min(0)
    bp_ref = ts.argmin(0)

    for name, kern in (("nocull", kernel_nocull), ("cull", kernel_cull)):
        try:
            t0 = time.time()
            bt, bp = run(kern, tbl, rays)
            bt.block_until_ready()
            compile_s = time.time() - t0
            bt = np.asarray(bt).reshape(-1)[:NS]
            bp = np.asarray(bp).reshape(-1)[:NS]
            hit = bt_ref < 1e7
            ok_t = np.allclose(bt[hit], bt_ref[hit], rtol=1e-5)
            ok_p = (bp[hit] == bp_ref[hit]).mean()
            t0 = time.time()
            for _ in range(reps):
                bt2, _ = run(kern, tbl, rays)
            bt2.block_until_ready()
            dt = (time.time() - t0) / reps
            print(f"{name}: compile={compile_s:.1f}s ok_t={ok_t} "
                  f"ok_p={ok_p:.4f} time={dt*1e3:.2f} ms/query "
                  f"({B/dt/1e6:.1f} Mrays/s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()

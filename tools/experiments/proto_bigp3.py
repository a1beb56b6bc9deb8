"""Prototype 3: isolate the fori_loop overhead.

  unroll     — full static Python unroll over chunks (VMEM table, static
               scalar reads; the original megakernel pattern at P=1280)
  scratch    — fori_loop, but best_t/best_p live in VMEM scratch refs and
               the chunk body is @pl.when-guarded (no value carry at all)
  chunk64    — value-carry fori_loop with CHUNK=64 (20 iters instead of 160)
Run: python tools/proto_bigp3.py [P] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tools.proto_bigp2 import make_scene, sphere_t


def k_unroll(tbl_ref, ox, oy, oz, dx, dy, dz, t_ref, p_ref):
    o = (ox[:, :], oy[:, :], oz[:, :])
    d = (dx[:, :], dy[:, :], dz[:, :])
    P = tbl_ref.shape[0]
    bt = jnp.full(ox.shape, 1e8)
    bp = jnp.zeros(ox.shape, jnp.int32)
    for k in range(P):
        tk = sphere_t(o, d, tbl_ref[k, 0], tbl_ref[k, 1], tbl_ref[k, 2],
                      tbl_ref[k, 3])
        better = tk < bt
        bt = jnp.where(better, tk, bt)
        bp = jnp.where(better, k, bp)
    t_ref[:, :] = bt
    p_ref[:, :] = bp


def k_scratch(tbl_ref, ox, oy, oz, dx, dy, dz, t_ref, p_ref):
    import jax.experimental.pallas as pl

    CHUNK = 8
    o = (ox[:, :], oy[:, :], oz[:, :])
    d = (dx[:, :], dy[:, :], dz[:, :])
    P = tbl_ref.shape[0]
    rx = 1.0 / jnp.where(dx[:, :] == 0.0, 1e-20, dx[:, :])
    ry = 1.0 / jnp.where(dy[:, :] == 0.0, 1e-20, dy[:, :])
    rz = 1.0 / jnp.where(dz[:, :] == 0.0, 1e-20, dz[:, :])
    t_ref[:, :] = jnp.full(ox.shape, 1e8)
    p_ref[:, :] = jnp.zeros(ox.shape, jnp.int32)

    def body(c, _):
        base = c * CHUNK
        bt = t_ref[:, :]
        t1x, t2x = (tbl_ref[base, 4] - o[0]) * rx, (tbl_ref[base, 7] - o[0]) * rx
        t1y, t2y = (tbl_ref[base, 5] - o[1]) * ry, (tbl_ref[base, 8] - o[1]) * ry
        t1z, t2z = (tbl_ref[base, 6] - o[2]) * rz, (tbl_ref[base, 9] - o[2]) * rz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.minimum(t1z, t2z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                       jnp.maximum(t1y, t2y)),
                           jnp.maximum(t1z, t2z))
        anyhit = jnp.any((tmax >= tmin) & (tmax >= 0.0) & (tmin < bt))

        @pl.when(anyhit)
        def _():
            bt = t_ref[:, :]
            bp = p_ref[:, :]
            for k in range(CHUNK):
                tk = sphere_t(o, d, tbl_ref[base + k, 0], tbl_ref[base + k, 1],
                              tbl_ref[base + k, 2], tbl_ref[base + k, 3])
                better = tk < bt
                bt = jnp.where(better, tk, bt)
                bp = jnp.where(better, base + k, bp)
            t_ref[:, :] = bt
            p_ref[:, :] = bp

        return 0

    jax.lax.fori_loop(0, P // CHUNK, body, 0)


def k_chunk64(tbl_ref, ox, oy, oz, dx, dy, dz, t_ref, p_ref):
    import jax.experimental.pallas as pl

    CHUNK = 64
    o = (ox[:, :], oy[:, :], oz[:, :])
    d = (dx[:, :], dy[:, :], dz[:, :])
    P = tbl_ref.shape[0]

    def body(c, carry):
        bt, bp = carry
        base = c * CHUNK
        for k in range(CHUNK):
            tk = sphere_t(o, d, tbl_ref[base + k, 0], tbl_ref[base + k, 1],
                          tbl_ref[base + k, 2], tbl_ref[base + k, 3])
            better = tk < bt
            bt = jnp.where(better, tk, bt)
            bp = jnp.where(better, base + k, bp)
        return bt, bp

    bt, bp = jax.lax.fori_loop(
        0, P // CHUNK,
        body, (jnp.full(ox.shape, 1e8), jnp.zeros(ox.shape, jnp.int32)))
    t_ref[:, :] = bt
    p_ref[:, :] = bp


def run(kern, tbl, rays, smem):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bs = rays[0].shape[0]
    tspec = (pl.BlockSpec(memory_space=pltpu.SMEM) if smem
             else pl.BlockSpec(tbl.shape, lambda i: (0, 0)))

    @jax.jit
    def go(tbl, *r):
        return pl.pallas_call(
            kern,
            grid=(Bs // 32,),
            in_specs=[tspec] + [pl.BlockSpec((32, 128), lambda i: (i, 0))] * 6,
            out_specs=[pl.BlockSpec((32, 128), lambda i: (i, 0))] * 2,
            out_shape=[
                jax.ShapeDtypeStruct((Bs, 128), jnp.float32),
                jax.ShapeDtypeStruct((Bs, 128), jnp.int32),
            ],
        )(tbl, *r)

    return go(tbl, *rays)


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 1280
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    B = 262144
    c, r = make_scene(P, 0)
    lo = (c - r).reshape(P // 8, 8, 3).min(1)
    hi = (c + r).reshape(P // 8, 8, 3).max(1)
    tbl = np.zeros((P, 10), np.float32)
    tbl[:, 0:3] = c
    tbl[:, 3] = r[:, 0]
    tbl[:, 4:7] = np.repeat(lo, 8, 0)
    tbl[:, 7:10] = np.repeat(hi, 8, 0)

    ext = float(np.abs(c).max() + 2)
    o = jax.random.uniform(jax.random.PRNGKey(1), (B, 3), minval=-ext, maxval=ext)
    d = jax.random.normal(jax.random.PRNGKey(2), (B, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    rays = tuple(jnp.asarray(np.asarray(x).reshape(B // 128, 128)) for x in
                 (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]))

    NS = 4096
    on, dn = np.asarray(o[:NS]), np.asarray(d[:NS])
    v = on[None] - c[:, None]
    qb = -(v * dn[None]).sum(-1)
    det = qb * qb - (v * v).sum(-1) + (r[:, 0:1]) ** 2
    sq = np.sqrt(np.maximum(det, 0.0))
    i1, i2 = qb - sq, qb + sq
    ts = np.where((det >= 0.0) & (i1 > 0.0) & (i2 > 0.0), i1, 1e8)
    bt_ref, bp_ref = ts.min(0), ts.argmin(0)
    hit = bt_ref < 1e7
    print(f"P={P} oracle hit frac={hit.mean():.3f}", flush=True)

    for name, kern, smem in (("unroll", k_unroll, False),
                             ("scratch", k_scratch, True),
                             ("chunk64", k_chunk64, True)):
        try:
            tb = jnp.asarray(tbl)
            t0 = time.time()
            bt, bp = run(kern, tb, rays, smem)
            bt.block_until_ready()
            compile_s = time.time() - t0
            btn = np.asarray(bt).reshape(-1)[:NS]
            bpn = np.asarray(bp).reshape(-1)[:NS]
            ok_t = bool(np.allclose(btn[hit], bt_ref[hit], rtol=1e-5))
            ok_p = float((bpn[hit] == bp_ref[hit]).mean()) if hit.any() else -1
            t0 = time.time()
            for _ in range(reps):
                bt2, _ = run(kern, tb, rays, smem)
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

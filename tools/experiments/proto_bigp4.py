"""Prototype 4: amortized timing — N queries per dispatch.

The proto2/3 numbers were garbage: each rep was its own dispatch through
the axon relay (100s of ms round-trip, PERF.md), swamping device time.
Here each timed call runs `reps` queries inside ONE jit (fori_loop with a
data dependency through the ray origins so nothing is CSE'd/DCE'd).

Baseline: the grid-streamed intersect-kernel pattern (known 12.6 ms/query
at P=1283 from PERF.md), same harness, so numbers are comparable.

Run: python tools/proto_bigp4.py [P] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tools")
from proto_bigp2 import k_smem_cull, k_smem_fori, k_vmem_fori, make_scene


def k_grid(tbl_ref, ox, oy, oz, dx, dy, dz, t_ref, p_ref):
    """Grid-streamed chunks: the intersect_kernel pattern (j axis walks
    8-row chunks, accumulator outputs revisited)."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:, :] = jnp.full(t_ref.shape, 1e8, jnp.float32)
        p_ref[:, :] = jnp.zeros(p_ref.shape, jnp.int32)

    o = (ox[:, :], oy[:, :], oz[:, :])
    d = (dx[:, :], dy[:, :], dz[:, :])
    bt = t_ref[:, :]
    bp = p_ref[:, :]
    base = j * 8
    for k in range(8):
        cx, cy, cz, r = (tbl_ref[k, 0], tbl_ref[k, 1], tbl_ref[k, 2],
                         tbl_ref[k, 3])
        vx, vy, vz = o[0] - cx, o[1] - cy, o[2] - cz
        qb = -(vx * d[0] + vy * d[1] + vz * d[2])
        det = qb * qb - (vx * vx + vy * vy + vz * vz) + r * r
        sq = jnp.sqrt(jnp.maximum(det, 0.0))
        i1, i2 = qb - sq, qb + sq
        tk = jnp.where((det >= 0.0) & (i1 > 0.0) & (i2 > 0.0), i1, 1e8)
        better = tk < bt
        bt = jnp.where(better, tk, bt)
        bp = jnp.where(better, base + k, bp)
    t_ref[:, :] = bt
    p_ref[:, :] = bp


def build_caller(kern, tbl, Bs, mode, reps):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = tbl.shape[0]
    if mode == "grid":
        grid = (Bs // 32, P // 8)
        in_specs = [pl.BlockSpec((8, tbl.shape[1]), lambda i, j: (j, 0))] + [
            pl.BlockSpec((32, 128), lambda i, j: (i, 0))] * 6
        out_specs = [pl.BlockSpec((32, 128), lambda i, j: (i, 0))] * 2
    else:
        grid = (Bs // 32,)
        tspec = (pl.BlockSpec(memory_space=pltpu.SMEM) if mode == "smem"
                 else pl.BlockSpec(tbl.shape, lambda i: (0, 0)))
        in_specs = [tspec] + [pl.BlockSpec((32, 128), lambda i: (i, 0))] * 6
        out_specs = [pl.BlockSpec((32, 128), lambda i: (i, 0))] * 2

    def query(tbl, r):
        return pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((Bs, 128), jnp.float32),
                jax.ShapeDtypeStruct((Bs, 128), jnp.int32),
            ],
        )(tbl, *r)

    @jax.jit
    def many(tbl, *r):
        def body(i, acc):
            rr = (r[0] + acc * 1e-30 + i * 1e-30,) + r[1:]
            t, p = query(tbl, rr)
            return jnp.max(t) * 1e-30
        acc = jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        t, p = query(tbl, (r[0] + acc,) + r[1:])
        return t, p

    return many


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 1280
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    B = 262144
    Bs = B // 128
    c, r = make_scene(P, 0)
    lo = (c - r).reshape(P // 8, 8, 3).min(1)
    hi = (c + r).reshape(P // 8, 8, 3).max(1)
    tbl = np.zeros((P, 16), np.float32)
    tbl[:, 0:3] = c
    tbl[:, 3] = r[:, 0]
    tbl[:, 4:7] = np.repeat(lo, 8, 0)
    tbl[:, 7:10] = np.repeat(hi, 8, 0)

    ext = float(np.abs(c).max() + 2)
    o = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (B, 3),
                                      minval=-ext, maxval=ext))
    dn = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (B, 3)))
    dn = dn / np.linalg.norm(dn, axis=-1, keepdims=True)
    rays = tuple(jnp.asarray(x.reshape(Bs, 128)) for x in
                 (o[:, 0], o[:, 1], o[:, 2], dn[:, 0], dn[:, 1], dn[:, 2]))

    NS = 4096
    v = o[:NS][None] - c[:, None]
    qb = -(v * dn[:NS][None]).sum(-1)
    det = qb * qb - (v * v).sum(-1) + (r[:, 0:1]) ** 2
    sq = np.sqrt(np.maximum(det, 0.0))
    i1, i2 = qb - sq, qb + sq
    ts = np.where((det >= 0.0) & (i1 > 0.0) & (i2 > 0.0), i1, 1e8)
    bt_ref, bp_ref = ts.min(0), ts.argmin(0)
    hit = bt_ref < 1e7
    print(f"P={P} reps/dispatch={reps} oracle hit frac={hit.mean():.3f}",
          flush=True)

    tb = jnp.asarray(tbl)
    for name, kern, mode in (("grid", k_grid, "grid"),
                             ("vmem_fori", k_vmem_fori, "vmem"),
                             ("smem_fori", k_smem_fori, "smem"),
                             ("smem_cull", k_smem_cull, "smem")):
        try:
            many = build_caller(kern, tb, Bs, mode, reps)
            t0 = time.time()
            bt, bp = many(tb, *rays)
            bt.block_until_ready()
            compile_s = time.time() - t0
            btn = np.asarray(bt).reshape(-1)[:NS]
            bpn = np.asarray(bp).reshape(-1)[:NS]
            ok_t = bool(np.allclose(btn[hit], bt_ref[hit], rtol=1e-4,
                                    atol=1e-4))
            ok_p = float((bpn[hit] == bp_ref[hit]).mean()) if hit.any() else -1
            t0 = time.time()
            bt2, _ = many(tb, *rays)
            bt2.block_until_ready()
            wall = time.time() - t0
            dt = wall / (reps + 1)
            print(f"{name}: compile={compile_s:.1f}s ok_t={ok_t} "
                  f"ok_p={ok_p:.4f} time={dt*1e3:.2f} ms/query "
                  f"({B/dt/1e6:.1f} Mrays/s) wall={wall:.2f}s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()

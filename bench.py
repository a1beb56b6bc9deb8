"""Benchmark matrix: render throughput on the attached device.

Prints one JSON line per config; the LAST line is the headline metric
(cornell-box 512x512) in the driver schema:
    {"metric", "value", "unit", "vs_baseline"}

Metric: pixel samples per second (W*H*passes / steady-state render time).
Each sample is a full path: up to 8 shading vertices with NEE, i.e. up to
25 scene-intersection queries per sample (RenderStats.rays_per_sec_upper).

The reference publishes no numbers (BASELINE.md), so vs_baseline is
measured against this repo's own recorded first value per config in
BASELINE_SELF.json (extended on first run of each config).

Configs follow BASELINE.md: cornell 512^2 (headline), glass0 + refrac0
256^2 (dielectric/branching-BSDF stress), room 512^2 (textures + multiple
lights), test1 (259 prims via urn evaluation — exercises the one-hot
gather tier), mesh0 (triangle mesh, if scenes/mesh0.urn exists).
"""

from __future__ import annotations

import json
import os
import pathlib
import time

REPO = pathlib.Path(__file__).parent
SCN = "/root/reference/scenes"


def bench_scene(name, path, w, h, passes=16, chunk=8, n=4):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from plutracer_tpu.render.renderer import render, render_passes, zeros_accum
    from plutracer_tpu.scene import compile_scene, load_scene_file
    from plutracer_tpu.semantics import DEFAULT_OPTIONS
    from plutracer_tpu.utils.profiling import RenderStats

    desc = load_scene_file(path, ["/res", f"{w}x{h}"])
    scene = compile_scene(desc)
    key = jax.random.PRNGKey(0)

    # warmup/compile; a scalar readback is the only honest sync point
    # through the remote-device relay (block_until_ready returns early)
    acc = zeros_accum(w, h)
    for wpass in range(2):
        acc = render_passes(
            scene, jax.random.fold_in(key, 100 + wpass), jnp.int32(0),
            w, h, n, chunk, accum=acc,
        )
    float(acc.sum())

    t0 = time.perf_counter()
    acc = zeros_accum(w, h)
    for s in range(0, passes, chunk):
        acc = render_passes(scene, key, jnp.int32(s), w, h, n, chunk, accum=acc)
    float(acc.sum())
    stats = RenderStats(w, h, passes, time.perf_counter() - t0)

    fps = flops_per_sample(scene)

    # --- validation: a fast benchmark that renders garbage is worthless.
    # (a) the timed accumulator must be finite; (b) a small same-seed
    # render through the default path must agree with the forced-XLA
    # integrator (catches a wrong-but-fast kernel; tolerances cover the
    # documented dielectric knife-edge lane flips).
    accn = np.asarray(acc)
    validated = bool(np.isfinite(accn).all())
    vkey = jax.random.PRNGKey(7)
    sv = compile_scene(load_scene_file(path, ["/res", "64x64"]))
    img_auto = np.asarray(render(sv, 64, 64, 2, vkey))
    img_xla = np.asarray(
        render(sv, 64, 64, 2, vkey,
               options=DEFAULT_OPTIONS.replace(integrator_backend="xla"))
    )
    a = np.log1p(np.maximum(img_auto, 0.0))
    b = np.log1p(np.maximum(img_xla, 0.0))
    validated &= bool(np.isfinite(img_auto).all())
    # systematic-error check: means must agree (a garbage-fast kernel fails
    # this by orders of magnitude); per-pixel threshold at 0.01 with a
    # knife-edge allowance (measured: mesh0 triangle edges flip 1.6% of
    # pixels > 0.01 at 4 spp with dlogmean 3e-4)
    validated &= abs(float(a.mean()) - float(b.mean())) < 0.02
    validated &= float((np.abs(a - b) > 0.01).mean()) < 0.025
    return stats, validated, fps


# FLOP-per-sample model (PERF.md): ~25 kFLOP of shading/NEE/RNG per sample
# plus (1 primary + max_bounces x 3) = 25 closest-hit queries per sample
# (lockstep: dead lanes still ride every chunk). Per-row-per-query FLOPs
# counted from the shared-stream kernel (_closest_stream3: tv/qv/e2qv and
# v.v amortized over the 3 queries): sphere ~40 (incl. the parent-AABB
# line test), box ~27, triangle ~44. The r4 model (flat 50/row against an
# ESTIMATED 3.0e12 ceiling) let mesh1 report 111% MFU; the ceiling is now
# MEASURED per run (see measure_vpu_flops) and the counts are per-type.
SHADING_FLOP = 25_000.0
ROW_FLOP = {0: 40.0, 1: 27.0, 2: 44.0}  # PRIM_SPHERE/BOX/TRIANGLE


def flops_per_sample(scene) -> float:
    import numpy as np

    ptype = np.asarray(scene.prim_type)
    rows = sum(ROW_FLOP[t] * float((ptype == t).sum()) for t in (0, 1, 2))
    return SHADING_FLOP + 25.0 * rows


def measure_vpu_flops() -> float:
    """Measured f32 VPU ceiling: a serial FMA chain over a VMEM-sized
    block, k iterations inside one jit (data-dependent, cannot be
    elided). Returns FLOP/s."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    N, K, U = (512, 1024), 64, 64  # U fused FMA stages per loop body:
    # a single-FMA body is HBM-bound (2 FLOP / 12 bytes ~ 0.16 TFLOP/s
    # measured); 64 stages fuse into one elementwise kernel and keep the
    # chain register-resident, exposing the VPU compute ceiling.
    # C=16 independent chains measured 3.84 TFLOP/s on v5e — matching
    # the 8x128-lane x 2-issue x 2-FLOP x ~0.94 GHz theoretical peak
    # (C=4: 2.3, C=8: 3.2 — FMA-latency-bound below that).

    C = 16  # independent interleaved chains (ILP against FMA latency)

    @jax.jit
    def burn(xs, a, b):
        def body(i, xs):
            for _ in range(U):
                xs = tuple(x * a + b for x in xs)
            return xs

        return jax.lax.fori_loop(0, K, body, xs)

    xs = tuple(jnp.ones(N) * (1.0 + 1e-6 * i) for i in range(C))
    a = jnp.ones(N) * 0.9999999
    b = jnp.ones(N) * 1e-7
    xs = burn(xs, a, b)
    float(xs[0].sum())  # compile + warm
    best = 0.0
    reps = 8
    for _ in range(3):  # best-of-3: the relay adds variable latency
        t0 = time.perf_counter()
        for _ in range(reps):
            xs = burn(xs, a, b)
        float(xs[0].sum())
        dt = time.perf_counter() - t0
        best = max(best, 2.0 * N[0] * N[1] * K * U * C * reps / dt)
    return best


def bench_train_step(w=256, h=256, n=2, steps=24):
    """Inverse-rendering train-step throughput (forward + backward +
    psum + adam) on cornell-box: the BASELINE gradient workload.

    Measures STEADY-STATE stepping: the train step is built once
    (make_train_step) and `steps` chunked optimization steps run in one
    device dispatch (step.many) — the shape real training has, where the
    one-time trace/compile is amortized over hundreds of steps. (The
    pre-r4 variant re-ran optimize_scene, which rebuilds and retraces
    make_train_step every call; it measured jit retrace + compile-cache
    loads through the device relay, not training.)"""
    import time

    import jax
    import numpy as np

    from plutracer_tpu.parallel.mesh import make_mesh
    from plutracer_tpu.parallel.sharded import get_params, make_train_step
    from plutracer_tpu.render.renderer import render
    from plutracer_tpu.scene import compile_scene, load_scene_file

    scene = compile_scene(
        load_scene_file(f"{SCN}/cornell-box.urn", ["/res", f"{w}x{h}"])
    )
    target = np.asarray(render(scene, w, h, 2, jax.random.PRNGKey(100)))
    target = target.reshape(-1, 3)
    step = make_train_step(
        scene, w, h, n, make_mesh(None), loss_space="log",
        trainable=("mat_color", "light_intensity"),
        project_nonnegative=True,
    )
    params = get_params(scene)
    opt_state = step.init(params)
    key = jax.random.PRNGKey(0)
    # warmup x2: the first call compiles the k-step scan; the second
    # recompiles once more because the RETURNED params/opt_state carry the
    # mesh's NamedSharding while the originals were single-device — from
    # the third call on, input shardings are stable (the state real
    # training loops are in after their first chunk)
    for wu in range(2):
        params, opt_state, losses, _ = step.many(
            params, opt_state, target, key, wu * steps, steps
        )
        float(np.asarray(losses).sum())
    t0 = time.perf_counter()
    params, opt_state, losses, nf = step.many(
        params, opt_state, target, key, 2 * steps, steps
    )
    ok = bool(np.isfinite(np.asarray(losses)).all())
    dt = time.perf_counter() - t0
    return w * h * steps / dt, ok  # forward samples/s through the train step


def main() -> None:
    import plutracer_tpu

    plutracer_tpu.enable_compilation_cache()

    self_path = REPO / "BASELINE_SELF.json"
    base = json.loads(self_path.read_text()) if self_path.exists() else {}
    if "samples_per_sec" in base:  # legacy round-1 key == cornell512
        base.setdefault("cornell512_samples_per_sec", base.pop("samples_per_sec"))

    configs = [
        # (key, scene path, W, H)
        ("glass0_256", f"{SCN}/glass0.urn", 256, 256),
        ("refrac0_256", f"{SCN}/refrac0.urn", 256, 256),
        ("room_512", f"{SCN}/room.urn", 512, 512),
        ("test1_256", f"{SCN}/test1.urn", 256, 256),
    ]
    mesh_scene = REPO / "scenes" / "mesh0.urn"
    if mesh_scene.exists():
        configs.append(("mesh0_256", str(mesh_scene), 256, 256))
    big_scene = REPO / "scenes" / "mesh1.urn"
    if big_scene.exists():
        # 20,483 prims: beyond the r3 16,384 streaming ceiling (r4 raised
        # it to 40,960); brute-force-linear in P, so ~16x slower than mesh0
        configs.append(("mesh1_256", str(big_scene), 256, 256))
    tex_scene = REPO / "scenes" / "textured0.urn"
    if tex_scene.exists():
        # image texture through the megakernel's VMEM-pinned atlas (r4)
        configs.append(("textured0_256", str(tex_scene), 256, 256))
    mtex_scene = REPO / "scenes" / "mesh-tex.urn"
    if mtex_scene.exists():
        # image texture ON a 20k-tri mesh: the r5 streaming-tier atlas
        # path (previously dropped to the ~2x-slower XLA fallback)
        configs.append(("meshtex_256", str(mtex_scene), 256, 256))
    hbm_scene = REPO / "scenes" / "mesh2.urn"
    if hbm_scene.exists():
        # 102,403 prims: the r5 HBM slab-DMA tier (tri table in HBM,
        # double-buffered VMEM scratch) — above the old 40,960 VMEM
        # ceiling there was no TPU path at all; brute-force-linear in P
        configs.append(("mesh2_128", str(hbm_scene), 128, 128))
    configs.append(("cornell512", f"{SCN}/cornell-box.urn", 512, 512))

    changed = False
    try:
        vpu = measure_vpu_flops()
    except Exception:
        vpu = 3.0e12  # pre-r5 estimate, flagged by the absent metric line
    else:
        print(json.dumps({"metric": "vpu_f32_flops_measured",
                          "value": round(vpu / 1e12, 3), "unit": "TFLOP/s",
                          "vs_baseline": 1.0}), flush=True)
    # gradient-workload throughput first (the LAST printed line must stay
    # the headline cornell512 metric for the driver)
    try:
        sps, ok = bench_train_step()
        bkey = "cornell256_train_samples_per_sec"
        if bkey not in base:
            base[bkey] = sps
            changed = True
        print(json.dumps({
            "metric": bkey, "value": round(sps, 1), "unit": "samples/s",
            "vs_baseline": round(sps / base[bkey], 3), "validated": ok,
        }), flush=True)
    except Exception as e:  # never let the grad bench kill the headline
        print(json.dumps({"metric": "cornell256_train_samples_per_sec",
                          "value": 0.0, "unit": "samples/s",
                          "vs_baseline": 0.0, "validated": False,
                          "error": str(e)[:120]}), flush=True)

    for key, path, w, h in configs:
        stats, validated, fps = bench_scene(key, path, w, h)
        sps = stats.samples_per_sec
        bkey = f"{key}_samples_per_sec"
        if bkey not in base:
            base[bkey] = sps
            changed = True
        line = {
            "metric": bkey,
            "value": round(sps, 1),
            "unit": "samples/s",
            "vs_baseline": round(sps / base[bkey], 3),
            "validated": validated,
            "mfu_pct": round(100.0 * sps * fps / vpu, 2),
        }
        print(json.dumps(line), flush=True)

    if changed:
        self_path.write_text(json.dumps(base, indent=1))


if __name__ == "__main__":
    main()

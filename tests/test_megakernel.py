"""Integrator megakernel vs the XLA scan integrator (interpret mode, CPU).

The megakernel (ops/pallas/integrator_kernel.py) is the DEFAULT TPU path
for eligible scenes, so its semantics must be pinned to the XLA integrator
(render/integrator.py::ray_color), which is itself parity-gated against the
reference (src/renderer.cpp:59-96). Both paths draw the same uniforms from
the same key, so they make identical sampling decisions and agree per-lane
up to float32 reassociation; the one caveat is the dielectric knife edge
(sphere.cpp:21-23 root selection) which can flip isolated lanes — hence a
tiny outlier allowance on top of a tight bulk tolerance.

These scenes cover every material type (diffuse, mirror, refract, glass),
both light types, area-light MIS with specular lanes (the exact
configuration of the round-2 bs/bs_nee NEE bug), procedural textures, and
thin-lens camera rays.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plutracer_tpu.ops.camera import generate_rays
from plutracer_tpu.ops.pallas.integrator_kernel import (
    DBG_C,
    megakernel_eligible,
    ray_color_pallas,
)
from plutracer_tpu.render.integrator import ray_color
from plutracer_tpu.render.renderer import pixel_centers
from plutracer_tpu.scene import compile_scene, load_scene_file
from plutracer_tpu.semantics import DEFAULT_OPTIONS

XLA = DEFAULT_OPTIONS.replace(integrator_backend="xla")

# scenes qualifying for the megakernel, chosen for coverage:
#  cornell-box — mirror + glass spheres inside an area-light box (MIS with
#                specular lanes: the round-2 NEE-sample bug's trigger)
#  refrac0     — reflection + refraction + grid texture
#  glass0      — glass + area light
#  room        — 3 point lights (is_delta path), checkerboard
#  test        — thin-lens DoF camera
#  minimal1    — box + area light only (all-diffuse control)
#  test1       — 257 prims: exercises the STREAMING kernel (P > MAX_P)
#  repo-mesh0  — 1283 prims incl. a triangle mesh: streaming + tri chunks
#  repo-textured0 — image texture: the VMEM-pinned atlas lane-gather path
#  repo-mesh-tex  — image texture ON a 20k-tri mesh: the STREAMING
#                   kernel's atlas path (r5)
SCENES = ["cornell-box", "refrac0", "glass0", "room", "test", "minimal1",
          "test1", "repo-mesh0", "repo-textured0", "repo-mesh-tex"]

# per-scene knife-edge allowance overrides: image textures on meshes turn
# float-reassociation-scale uv differences into O(1) albedo flips at
# texel boundaries (the in-kernel atlas fetch is texel-exact — verified
# against eval_color_rows — but the uv feeding it is backend-sensitive)
OUTLIER_ALLOWANCE = {"repo-mesh-tex": 0.03}


def camera_rays(scene, res=32, key=0):
    """One jittered camera ray per pixel at res x res."""
    px0 = pixel_centers(res, res)
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    px = px0 + jax.random.uniform(k1, px0.shape)
    lens = jax.random.uniform(k2, px0.shape)
    return generate_rays(scene.camera, px, lens)


def load(name):
    if name.startswith("repo-"):
        path = f"scenes/{name[5:]}.urn"
    else:
        path = f"/root/reference/scenes/{name}.urn"
    d = load_scene_file(path, ["/res", "32x32"])
    return compile_scene(d)


@pytest.mark.parametrize("name", SCENES)
def test_ray_color_equivalence(name):
    s = load(name)
    assert megakernel_eligible(s, DEFAULT_OPTIONS)
    # streaming-path scenes run at a smaller batch: interpret-mode cost is
    # O(B * P) and P is 5-20x larger there
    res = 16 if s.prim_type.shape[0] > 64 else 32
    o, d = camera_rays(s, res=res)
    key = jax.random.PRNGKey(7)
    ref = np.asarray(ray_color(s, o, d, key, XLA))
    out = np.asarray(ray_color_pallas(s, o, d, key, DEFAULT_OPTIONS,
                                      interpret=True))
    assert np.isfinite(out).all()
    # bulk: tight agreement in log1p space (bounds emissive dynamic range)
    a = np.log1p(np.maximum(out, 0.0))
    b = np.log1p(np.maximum(ref, 0.0))
    diff = np.abs(a - b)
    # measured knife-edge flip rates (CPU interpret vs XLA, B=1024, key 7):
    # cornell-box 0.81%, others lower — decision boundaries (dielectric root
    # pick, u<0.5 component select) flip under reassociated float32 math and
    # the flipped lane then carries a completely different path
    outliers = (diff > 1e-3).mean()
    allowance = OUTLIER_ALLOWANCE.get(name, 0.02)
    assert outliers <= allowance, (
        f"{name}: {outliers:.2%} lanes differ > 1e-3 (knife-edge allowance "
        f"is {allowance:.0%}); p99={np.quantile(diff, 0.99):.2e} "
        f"max={diff.max():.2e}"
    )
    # aggregate: log-space means must agree — catches systematic estimator
    # errors (the round-2 NEE sample mixup shifted cornell's mean radiance
    # 6.77 -> 2115, i.e. log1p mean +threefold) while staying robust to the
    # handful of knife-edge fireflies that dominate a raw-mean comparison
    # at B=1024 (observed: 10.63 vs 10.29 raw from ~3 flipped lanes)
    assert abs(a.mean() - b.mean()) <= 0.02, (
        f"{name}: log1p mean {a.mean():.4f} vs {b.mean():.4f}"
    )


def test_hbm_tier_matches_vmem_stream(monkeypatch):
    """The HBM slab-DMA tier (tables in memory_space=ANY walked through a
    double-buffered VMEM scratch — r5, P unbounded by VMEM) must produce
    the same images as the all-VMEM stream tier. Forced onto a small
    scene by dropping the row threshold so the test stays cheap; the
    per-chunk math is shared, only the chunk loader differs
    (_stream_chunks)."""
    from plutracer_tpu.ops.pallas import integrator_kernel as ik

    s_vmem = load("test1")
    o, d = camera_rays(s_vmem, res=16)
    key = jax.random.PRNGKey(7)
    ref = np.asarray(ray_color_pallas(s_vmem, o, d, key, DEFAULT_OPTIONS,
                                      interpret=True))
    monkeypatch.setattr(ik, "HBM_MIN_ROWS", 64)
    s_hbm = load("test1")  # re-packs with the slab/128-col HBM layout
    assert s_hbm.prims_mega.sph.shape[1] == 128  # actually on the HBM tier
    out = np.asarray(ray_color_pallas(s_hbm, o, d, key, DEFAULT_OPTIONS,
                                      interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("sort", ["none", "compact", "morton"])
def test_wavefront_matches_monolithic_stream(sort):
    """The opt-in per-bounce wavefront dispatch (stream_wavefront=True)
    must agree with the monolithic stream kernel for every reorder mode:
    the bounce body is shared and uniforms travel with their rays, so the
    paths are the same math in a different dispatch shape."""
    s = load("test1")  # 257 prims: streaming tier
    o, d = camera_rays(s, res=16)
    key = jax.random.PRNGKey(7)
    mono = np.asarray(ray_color_pallas(s, o, d, key, DEFAULT_OPTIONS,
                                       interpret=True))
    wf_opts = DEFAULT_OPTIONS.replace(stream_wavefront=True,
                                      stream_sort=sort)
    wf = np.asarray(ray_color_pallas(s, o, d, key, wf_opts, interpret=True))
    assert np.isfinite(wf).all()
    a = np.log1p(np.maximum(wf, 0.0))
    b = np.log1p(np.maximum(mono, 0.0))
    diff = np.abs(a - b)
    # same uniforms, same decisions: agreement is reassociation-tight
    assert (diff > 1e-3).mean() <= 0.005, (
        f"sort={sort}: {(diff > 1e-3).mean():.2%} lanes differ; "
        f"max={diff.max():.2e}"
    )
    assert abs(a.mean() - b.mean()) <= 0.01


def test_unroll_matches_fori_loop():
    """The unrolled bounce body is the same program as the fori_loop one."""
    s = load("minimal1")
    o, d = camera_rays(s, res=16)
    key = jax.random.PRNGKey(3)
    a = np.asarray(ray_color_pallas(s, o, d, key, DEFAULT_OPTIONS,
                                    interpret=True))
    b = np.asarray(ray_color_pallas(s, o, d, key, DEFAULT_OPTIONS,
                                    interpret=True, unroll=True))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_grad_through_pallas_dispatch():
    """jax.grad through the megakernel path must equal the XLA path's
    gradient: ray_color's pallas branch carries a custom_vjp whose
    backward re-runs the XLA integrator's VJP with the same key."""
    import dataclasses

    # cornell-box: diffuse walls give a non-trivial mat_color gradient
    # (minimal1 would not — its only surface IS the emitter)
    s = load("cornell-box")
    o, d = camera_rays(s, res=8)
    key = jax.random.PRNGKey(11)
    # full shipping depth (max_bounces=8): this VJP compile once
    # segfaulted XLA:CPU's LLVM when run late in a ~225-test process.
    # Dropping the process's accumulated compiled-executable state first
    # keeps the big linearized-scan compile in a lightly-loaded LLVM
    # context (the crash never reproduced in a fresh process); xdist
    # loadfile distribution further isolates this file.
    jax.clear_caches()
    forced = DEFAULT_OPTIONS.replace(
        integrator_backend="pallas", pallas_interpret=True, max_bounces=8
    )

    def loss(mat_color, opts):
        s2 = dataclasses.replace(s, mat_color=mat_color)
        return jnp.mean(ray_color(s2, o, d, key, opts))

    g_pallas = jax.grad(loss)(s.mat_color, forced)
    g_xla = jax.grad(loss)(s.mat_color, XLA)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-5, atol=1e-7
    )
    assert np.abs(np.asarray(g_xla)).max() > 0.0  # non-trivial gradient


def test_debug_channels():
    """debug=True emits (mb, DBG_C, B) per-bounce state; sanity-check the
    alive flag: it must be 1 at bounce 0 for rays whose primary hit exists
    and non-increasing over bounces."""
    s = load("cornell-box")
    o, d = camera_rays(s, res=16)
    key = jax.random.PRNGKey(5)
    out, dbg = ray_color_pallas(s, o, d, key, DEFAULT_OPTIONS,
                                interpret=True, debug=True)
    mb = DEFAULT_OPTIONS.max_bounces
    dbg = np.asarray(dbg)
    assert dbg.shape == (mb, DBG_C, o.shape[0])
    assert np.isfinite(np.asarray(out)).all()
    cur = dbg[:, 8, :]  # 0/1 "ray active at this bounce" channel
    assert set(np.unique(cur)) <= {0.0, 1.0}
    # cornell-box camera rays all hit the box interior
    assert cur[0].mean() > 0.99
    # activity never resurrects after death
    assert (np.diff(cur, axis=0) <= 0.0 + 1e-6).all()


def test_grad_through_pallas_dispatch_compiled_tpu():
    """COMPILED (non-interpret) full-depth megakernel VJP on the real
    accelerator: the Pallas forward runs compiled and the custom_vjp
    backward re-runs the XLA VJP. The CI suite forces JAX_PLATFORMS=cpu
    (conftest), where this skips; run it on hardware with
    `JAX_PLATFORMS= python -m pytest tests/test_megakernel.py -k
    compiled_tpu` (done and recorded each round — PERF.md r5)."""
    import dataclasses

    if jax.default_backend() == "cpu":
        pytest.skip("needs a real accelerator (suite pins CPU)")
    s = load("cornell-box")
    o, d = camera_rays(s, res=8)
    key = jax.random.PRNGKey(11)
    forced = DEFAULT_OPTIONS.replace(
        integrator_backend="pallas", max_bounces=8
    )

    def loss(mat_color, opts):
        s2 = dataclasses.replace(s, mat_color=mat_color)
        return jnp.mean(ray_color(s2, o, d, key, opts))

    g_pallas = jax.grad(loss)(s.mat_color, forced)
    g_xla = jax.grad(loss)(s.mat_color, XLA)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-6
    )
    assert np.abs(np.asarray(g_xla)).max() > 0.0

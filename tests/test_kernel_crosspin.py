"""Cross-pin the megakernel's in-kernel physics against the ops/ oracles.

~650 lines of BSDF/light/intersection math exist twice: once in array form
(ops/bsdf.py, ops/lights.py, ops/intersect.py — the XLA integrator) and
once in component-tuple form inside the Pallas megakernel
(ops/pallas/integrator_kernel.py). These property tests call each kernel
helper OUTSIDE pallas (they are plain jnp functions) on random batches
drawn from real scene tables and assert agreement with the oracle, so a
semantics-quirk edit applied to only one copy fails here instead of
silently forking TPU vs CPU behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plutracer_tpu.ops import bsdf as bsdf_ops
from plutracer_tpu.ops import intersect, lights
from plutracer_tpu.ops.pallas import integrator_kernel as K
from plutracer_tpu.ops.tables import (
    gather_light,
    gather_mat,
    gather_prim,
    gather_tex,
    pack_tables,
)
from plutracer_tpu.ops.texture import eval_color_rows
from plutracer_tpu.scene import compile_scene, load_scene_file
from plutracer_tpu.semantics import DEFAULT_OPTIONS

B = 4096

# cover sphere/box/triangle prims, all 5 material types, both light types
SCENES = {
    "cornell-box": "/root/reference/scenes/cornell-box.urn",
    "refrac0": "/root/reference/scenes/refrac0.urn",
    "room": "/root/reference/scenes/room.urn",
    "repo-mesh0": "scenes/mesh0.urn",
}


def t3(x):
    """(B,3) array -> component tuple."""
    return (x[..., 0], x[..., 1], x[..., 2])


def arr3(t):
    return np.stack([np.asarray(c) for c in t], -1)


def load(path):
    return compile_scene(load_scene_file(path, ["/res", "16x16"]))


def prim_dict(rows):
    """PrimRows -> the dict the kernel's fetch() would build."""
    return {
        "ptype": rows.ptype,
        "a": t3(rows.a),
        "b": t3(rows.b),
        "c": t3(rows.c),
        "n0": t3(rows.n0),
        "n1": t3(rows.n1),
        "n2": t3(rows.n2),
        "uv0": (rows.uv0[..., 0], rows.uv0[..., 1]),
        "uv1": (rows.uv1[..., 0], rows.uv1[..., 1]),
        "uv2": (rows.uv2[..., 0], rows.uv2[..., 1]),
        "area": rows.area,
        "material": rows.material,
        "light": rows.light,
    }


def rand_state(scene, seed):
    """Random rays + random per-lane prim/mat/light row assignments."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    tables = pack_tables(scene)
    P = scene.prim_type.shape[0]
    L = scene.light_type.shape[0]
    M = scene.mat_type.shape[0]
    o = jax.random.uniform(ks[0], (B, 3), minval=-12.0, maxval=12.0)
    d = jax.random.normal(ks[1], (B, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pi = jax.random.randint(ks[2], (B,), 0, P)
    li = jax.random.randint(ks[3], (B,), 0, L)
    mi = jax.random.randint(ks[4], (B,), 0, M)
    u = jax.random.uniform(ks[5], (B, 12))
    return tables, o, d, pi, li, mi, u


@pytest.mark.parametrize("name", sorted(SCENES))
def test_hit_detail_pin(name):
    scene = load(SCENES[name])
    tables, o, d, pi, *_ = rand_state(scene, 1)
    rows = gather_prim(tables, pi)
    t = intersect.prim_t_rows(o, d, rows)
    found = t < intersect.T_MAX
    if not bool(found.any()):
        pytest.skip("no ray hit its assigned prim")
    ref = intersect.hit_detail_rows(o, d, jnp.where(found, t, 1.0), pi, found, rows)
    p, norm, uv, dpdu = K._hit_detail(prim_dict(rows), t3(o), t3(d), t, found)
    m = np.asarray(found)
    np.testing.assert_allclose(arr3(p)[m], np.asarray(ref.p)[m], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        arr3(norm)[m], np.asarray(ref.norm)[m], rtol=1e-4, atol=1e-5
    )
    kuv = np.stack([np.asarray(uv[0]), np.asarray(uv[1])], -1)
    np.testing.assert_allclose(kuv[m], np.asarray(ref.uv)[m], rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(
        arr3(dpdu)[m], np.asarray(ref.dpdu)[m], rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("name", sorted(SCENES))
@pytest.mark.parametrize("nso", [False, True])
def test_bsdf_sample_pin(name, nso):
    scene = load(SCENES[name])
    tables, o, d, pi, li, mi, u = rand_state(scene, 2)
    mrows = gather_mat(tables, mi)
    ks = jax.random.split(jax.random.PRNGKey(99), 2)
    norm = jax.random.normal(ks[0], (B, 3))
    norm = norm / jnp.linalg.norm(norm, axis=-1, keepdims=True)
    dpdu = jax.random.normal(ks[1], (B, 3))
    frame = bsdf_ops.make_frame(norm, dpdu)
    albedo = mrows.color
    wwo = -d
    ref = bsdf_ops.bsdf_sample(
        frame, mrows.mtype, albedo, mrows.eta, mrows.k,
        wwo, u[:, 0], u[:, 1:3], non_specular_only=nso,
    )
    kframe = K._make_frame(t3(norm), t3(dpdu))
    md = {
        "mtype": mrows.mtype,
        "albedo": t3(albedo),
        "eta": t3(mrows.eta),
        "k": t3(mrows.k),
    }
    out = K._bsdf_sample(kframe, md, t3(wwo), u[:, 0], u[:, 1], u[:, 2],
                         non_specular_only=nso)
    np.testing.assert_allclose(arr3(out["f"]), np.asarray(ref.f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(arr3(out["wwi"]), np.asarray(ref.wwi),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pdf"]), np.asarray(ref.pdf),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(out["is_specular"]).astype(bool), np.asarray(ref.is_specular)
    )


@pytest.mark.parametrize("name", sorted(SCENES))
@pytest.mark.parametrize("origin_pdf", [False, True])
def test_surface_pdf_pin(name, origin_pdf):
    scene = load(SCENES[name])
    tables, o, d, pi, *_ = rand_state(scene, 3)
    rows = gather_prim(tables, pi)
    opts = DEFAULT_OPTIONS.replace(origin_distance_pdf=origin_pdf)
    ref = lights.surface_pdf_rows(rows, o, d, opts)
    out = K._surface_pdf(prim_dict(rows), t3(o), t3(d), origin_pdf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", sorted(SCENES))
@pytest.mark.parametrize("origin_pdf", [False, True])
def test_sample_light_pin(name, origin_pdf):
    scene = load(SCENES[name])
    tables, o, d, pi, li, mi, u = rand_state(scene, 4)
    lrows = gather_light(tables, li)
    carrier = gather_prim(tables, jnp.maximum(lrows.prim, 0))
    opts = DEFAULT_OPTIONS.replace(origin_distance_pdf=origin_pdf)
    ref = lights.sample_light_rows(lrows, carrier, o, u[:, 0:2], u[:, 2],
                                   u[:, 3], opts)
    ld = {
        "ltype": lrows.ltype,
        "pos": t3(lrows.pos),
        "intensity": t3(lrows.intensity),
    }
    out = K._sample_light(ld, prim_dict(carrier), t3(o), u[:, 0], u[:, 1],
                          u[:, 2], u[:, 3], origin_pdf)
    np.testing.assert_allclose(arr3(out["Li"]), np.asarray(ref.Li),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(arr3(out["wi"]), np.asarray(ref.wi),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pdf"]), np.asarray(ref.pdf),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out["is_delta"]).astype(bool), np.asarray(ref.is_delta)
    )


@pytest.mark.parametrize("name", ["refrac0", "room"])
def test_eval_albedo_pin(name):
    """Procedural texture eval (checker + grid); image textures are gated
    out of the megakernel so only ttype 0/1 rows occur here."""
    scene = load(SCENES[name])
    tables, o, d, pi, li, mi, u = rand_state(scene, 5)
    mrows = gather_mat(tables, mi)
    trows = gather_tex(tables, jnp.maximum(mrows.tex, 0))
    uv = jax.random.uniform(jax.random.PRNGKey(6), (B, 2), minval=-3.0,
                            maxval=3.0)
    ref = eval_color_rows(scene.atlas, mrows, trows, uv, False)
    td = {
        "ttype": trows.ttype,
        "c0": t3(trows.c0),
        "c1": t3(trows.c1),
        "scale": trows.scale,
        "line": trows.line,
    }
    md = {"tex": mrows.tex.astype(jnp.float32), "color": t3(mrows.color)}
    out = K._eval_albedo(md, td, (uv[:, 0], uv[:, 1]))
    np.testing.assert_allclose(arr3(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("name", sorted(SCENES))
def test_closest_pin(name):
    """Kernel brute-force closest hit vs intersect_lite over real tables."""
    scene = load(SCENES[name])
    tables, o, d, *_ = rand_state(scene, 7)
    f_ref, p_ref, t_ref = intersect.intersect_lite(scene, o, d)
    prim_rows = [
        (
            int(np.asarray(scene.prim_type)[k]),
            t3(tables.prim[k, 1:4]),
            t3(tables.prim[k, 4:7]),
            t3(tables.prim[k, 7:10]),
        )
        for k in range(scene.prim_type.shape[0])
    ]
    # _closest assumes the kernel's fixed (32,128) tile shape
    tile = lambda v: tuple(c.reshape(K.TILE) for c in t3(v))
    f, p, t = (np.asarray(x).reshape(-1) for x in K._closest(prim_rows, tile(o), tile(d)))
    np.testing.assert_array_equal(f, np.asarray(f_ref))
    m = np.asarray(f_ref)
    np.testing.assert_array_equal(p[m], np.asarray(p_ref)[m])
    np.testing.assert_allclose(t[m], np.asarray(t_ref)[m], rtol=1e-5)

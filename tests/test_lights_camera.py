"""Light sampling, surface pdf quirk, camera ray generation, textures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plutracer_tpu.ops import lights as L
from plutracer_tpu.ops.camera import generate_rays
from plutracer_tpu.ops.texture import eval_color
from plutracer_tpu.scene import compile_scene
from plutracer_tpu.scene.compile import build_camera
from plutracer_tpu.scene.types import (
    LIGHT_AREA,
    LIGHT_POINT,
    MAT_DIFFUSE,
    MAT_EMISSION,
    PRIM_BOX,
    PRIM_SPHERE,
    TEX_CHECKERBOARD,
    TEX_GRID,
    LightDesc,
    MaterialDesc,
    PrimDesc,
    SceneDesc,
    TextureDesc,
)
from plutracer_tpu.semantics import DEFAULT_OPTIONS, TEXTBOOK_OPTIONS


def cornell_light_scene():
    """The cornell-box area light: box center (0,3,0) extent (1,0.1,1)."""
    d = SceneDesc()
    c = np.array([0, 3, 0], np.float32)
    e = np.array([1, 0.1, 1], np.float32)
    pid = d.add_prim(PrimDesc(PRIM_BOX, a=c - e, b=c + e))
    mid = d.add_material(MaterialDesc(MAT_EMISSION))
    lid = d.add_light(
        LightDesc(LIGHT_AREA, intensity=np.array([500, 500, 490], np.float32), prim=pid)
    )
    d.prims[pid].material = mid
    d.prims[pid].light = lid
    return compile_scene(d)


def test_surface_pdf_origin_distance_quirk():
    s = cornell_light_scene()
    p = jnp.zeros((1, 3))
    wi = jnp.asarray([[0.0, 1.0, 0.0]])
    prim = jnp.asarray([0])
    # hit at (0, 2.9, 0) on the bottom face; |hitpoint|^2 = 8.41
    # area = 2*(2*0.2 + 2*2 + 0.2*2) = 9.6 ; |cos| = 1
    pdf = L.surface_pdf(s, prim, p, wi, DEFAULT_OPTIONS)
    assert float(pdf[0]) == pytest.approx(2.9**2 / 9.6, rel=1e-5)
    # textbook mode: t^2 = 8.41 too here (origin at 0)... distinguish by
    # shifting p off the origin
    p2 = jnp.asarray([[2.0, 0.0, 0.0]])
    wi2 = jnp.asarray([[-2.0, 2.9, 0.0]]) / np.linalg.norm([2.0, 2.9, 0.0])
    pdf_q = L.surface_pdf(s, prim, p2, wi2, DEFAULT_OPTIONS)
    pdf_t = L.surface_pdf(s, prim, p2, wi2, TEXTBOOK_OPTIONS)
    t = np.linalg.norm([2.0, 2.9, 0.0])
    cos = 2.9 / t
    # quirk: |hit point|^2 = |(0, 2.9, 0)|^2 = 8.41
    assert float(pdf_q[0]) == pytest.approx(8.41 / (cos * 9.6), rel=1e-4)
    assert float(pdf_t[0]) == pytest.approx(t**2 / (cos * 9.6), rel=1e-4)


def test_surface_pdf_miss_is_zero():
    s = cornell_light_scene()
    pdf = L.surface_pdf(
        s, jnp.asarray([0]), jnp.zeros((1, 3)), jnp.asarray([[0.0, -1.0, 0.0]]),
        DEFAULT_OPTIONS,
    )
    assert float(pdf[0]) == 0.0


def test_point_light_sample():
    d = SceneDesc()
    d.add_light(
        LightDesc(LIGHT_POINT, pos=np.array([0, 5, 0], np.float32),
                  intensity=np.array([20, 20, 20], np.float32))
    )
    d.add_prim(PrimDesc(PRIM_SPHERE, a=np.zeros(3, np.float32),
                        b=np.array([1, 0, 0], np.float32)))
    d.materials.append(MaterialDesc(MAT_DIFFUSE))
    d.prims[0].material = 0
    s = compile_scene(d)
    p = jnp.asarray([[0.0, 1.0, 0.0]])
    ls = L.sample_light(
        s, jnp.asarray([0]), p, jnp.zeros((1, 2)), jnp.zeros((1,)), jnp.zeros((1,)),
        DEFAULT_OPTIONS,
    )
    assert bool(ls.is_delta[0])
    np.testing.assert_allclose(ls.wi[0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(ls.Li[0], 20 / 16.0, rtol=1e-5)
    assert float(ls.pdf[0]) == 1.0


def test_box_surface_sampling_on_faces():
    s = cornell_light_scene()
    n = 512
    key = jax.random.PRNGKey(3)
    u2 = jax.random.uniform(key, (n, 2))
    uf = jax.random.uniform(jax.random.PRNGKey(4), (n,))
    ua = jax.random.uniform(jax.random.PRNGKey(5), (n,))
    ps, ns = L.sample_surface(s, jnp.zeros((n,), jnp.int32), u2, uf, ua)
    ps = np.asarray(ps)
    ns = np.asarray(ns)
    lo = np.array([-1, 2.9, -1])
    hi = np.array([1, 3.1, 1])
    assert (ps >= lo - 1e-5).all() and (ps <= hi + 1e-5).all()
    # each point lies exactly on one face, with the matching axis normal
    on_face = (np.abs(ps - lo) < 1e-5) | (np.abs(ps - hi) < 1e-5)
    rows = np.abs(ns).argmax(1)
    assert on_face[np.arange(n), rows].all()
    np.testing.assert_allclose(np.abs(ns).sum(1), 1.0)


def test_emitted_one_sided():
    s = cornell_light_scene()
    prim = jnp.asarray([0])
    n = jnp.asarray([[0.0, -1.0, 0.0]])  # bottom face normal
    up = jnp.asarray([[0.0, 1.0, 0.0]])
    down = jnp.asarray([[0.0, -1.0, 0.0]])
    # viewer below: w = -d points down... Le gated on dot(norm, w) > 0
    np.testing.assert_allclose(
        L.emitted(s, prim, n, down)[0], [500, 500, 490], rtol=1e-6
    )
    np.testing.assert_allclose(L.emitted(s, prim, n, up)[0], 0.0)


# ---------------- camera ----------------


def test_camera_center_ray():
    cam = build_camera(
        np.array([0, 1, -8], np.float32), np.array([0, 1, 0], np.float32), (512, 512)
    )
    px = jnp.asarray([[256.0, 256.0]])  # NDC (0,0)
    o, d = generate_rays(cam, px, jnp.zeros((1, 2)))
    np.testing.assert_allclose(o[0], [0, 1, -8], atol=1e-6)
    np.testing.assert_allclose(d[0], [0, 0, 1], atol=1e-6)


def test_camera_corner_rays_y_flip():
    cam = build_camera(
        np.array([0, 0, -8], np.float32), np.zeros(3, np.float32), (512, 512)
    )
    top, _ = generate_rays(cam, jnp.asarray([[256.0, 0.0]]), jnp.zeros((1, 2)))
    o, d_top = generate_rays(cam, jnp.asarray([[256.0, 0.0]]), jnp.zeros((1, 2)))
    _, d_bot = generate_rays(cam, jnp.asarray([[256.0, 512.0]]), jnp.zeros((1, 2)))
    assert float(d_top[0, 1]) > 0  # top of image looks up
    assert float(d_bot[0, 1]) < 0
    # direction = norm(2.5*look + uv.x*right + uv.y*up): at top uv.y=-1*-1=1
    expect = np.array([0, 1.5, 2.5]) / np.linalg.norm([0, 1.5, 2.5])
    np.testing.assert_allclose(d_top[0], expect, atol=1e-6)


def test_camera_thin_lens_focus():
    # rays through different lens points converge at the focal plane
    cam = build_camera(
        np.array([0, 0, -5], np.float32), np.zeros(3, np.float32), (256, 256),
        lens_radius=0.2, focal_distance=5.0,
    )
    px = jnp.tile(jnp.asarray([[190.0, 70.0]]), (2, 1))
    lens_u = jnp.asarray([[0.1, 0.2], [0.9, 0.7]])
    o, d = generate_rays(cam, px, lens_u)
    o = np.asarray(o)
    d = np.asarray(d)
    assert np.abs(o[0] - o[1]).max() > 1e-4  # different lens points
    # both rays pass (nearly) through the same focal-plane point
    t0 = 5.0 / d[0, 2]
    t1 = 5.0 / d[1, 2]
    p0 = o[0] + d[0] * t0
    p1 = o[1] + d[1] * t1
    np.testing.assert_allclose(p0, p1, atol=1e-4)


# ---------------- textures ----------------


def tex_scene(tdesc):
    d = SceneDesc()
    tid = d.add_texture(tdesc)
    d.add_material(MaterialDesc(MAT_DIFFUSE, tex=tid))
    d.add_prim(
        PrimDesc(PRIM_SPHERE, a=np.zeros(3, np.float32), b=np.array([1, 0, 0], np.float32))
    )
    d.prims[0].material = 0
    return compile_scene(d)


def test_checkerboard():
    s = tex_scene(
        TextureDesc(TEX_CHECKERBOARD, c0=np.array([1, 0, 0], np.float32),
                    c1=np.array([0, 1, 0], np.float32), scale=8)
    )
    mat = jnp.zeros((4,), jnp.int32)
    uv = jnp.asarray([[0.01, 0.01], [0.2, 0.01], [0.2, 0.2], [0.95, 0.01]])
    c = np.asarray(eval_color(s, mat, uv))
    np.testing.assert_allclose(c[0], [1, 0, 0])  # cell (0,0) even
    np.testing.assert_allclose(c[1], [0, 1, 0])  # cell (1,0) odd
    np.testing.assert_allclose(c[2], [1, 0, 0])  # cell (1,1) even
    np.testing.assert_allclose(c[3], [0, 1, 0])  # cell (7,0) odd


def test_grid():
    fg = np.array([1, 0, 0], np.float32)
    bg = np.array([0, 0, 1], np.float32)
    s = tex_scene(TextureDesc(TEX_GRID, c0=fg, c1=bg, scale=4, line=0.1))
    mat = jnp.zeros((3,), jnp.int32)
    uv = jnp.asarray([[0.01, 0.13], [0.13, 0.13], [0.13, 0.01]])
    c = np.asarray(eval_color(s, mat, uv))
    np.testing.assert_allclose(c[0], fg)  # on a vertical line (fract=0.04)
    np.testing.assert_allclose(c[1], bg)  # off lines (fract=0.52)
    np.testing.assert_allclose(c[2], fg)  # on a horizontal line


def test_constant_color():
    d = SceneDesc()
    d.add_material(MaterialDesc(MAT_DIFFUSE, color=np.array([0.2, 0.4, 0.6], np.float32)))
    d.add_prim(
        PrimDesc(PRIM_SPHERE, a=np.zeros(3, np.float32), b=np.array([1, 0, 0], np.float32))
    )
    d.prims[0].material = 0
    s = compile_scene(d)
    c = eval_color(s, jnp.zeros((1,), jnp.int32), jnp.asarray([[0.5, 0.5]]))
    np.testing.assert_allclose(c[0], [0.2, 0.4, 0.6], rtol=1e-6)

"""Intersection tests vs closed forms, including the reference's accept-rule
quirks that make zero-epsilon shadow rays work."""

import jax.numpy as jnp
import numpy as np
import pytest

from plutracer_tpu.ops import intersect
from plutracer_tpu.scene import compile_scene
from plutracer_tpu.scene.types import (
    PRIM_BOX,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
    MaterialDesc,
    MAT_DIFFUSE,
    PrimDesc,
    SceneDesc,
)


def make_scene(prims):
    d = SceneDesc()
    mid = d.add_material(MaterialDesc(MAT_DIFFUSE, color=np.ones(3, np.float32)))
    for p in prims:
        p.material = mid
        d.add_prim(p)
    d.cam_pos = np.array([0, 0, -5], np.float32)
    d.cam_target = np.zeros(3, np.float32)
    return compile_scene(d)


def sphere(center, radius):
    return PrimDesc(
        PRIM_SPHERE,
        a=np.asarray(center, np.float32),
        b=np.array([radius, 0, 0], np.float32),
    )


def box(center, extent):
    c = np.asarray(center, np.float32)
    e = np.asarray(extent, np.float32)
    return PrimDesc(PRIM_BOX, a=c - e, b=c + e)


def tri(v0, v1, v2):
    return PrimDesc(
        PRIM_TRIANGLE,
        a=np.asarray(v0, np.float32),
        b=np.asarray(v1, np.float32),
        c=np.asarray(v2, np.float32),
    )


def shoot(scene, o, d):
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    return intersect.intersect_closest(scene, o, d)


def test_sphere_frontal():
    s = make_scene([sphere([0, 0, 0], 1.0)])
    h = shoot(s, [0, 0, -5], [0, 0, 1])
    assert bool(h.found[0])
    assert float(h.t[0]) == pytest.approx(4.0, rel=1e-5)
    np.testing.assert_allclose(h.norm[0], [0, 0, -1], atol=1e-5)


def test_sphere_miss():
    s = make_scene([sphere([0, 0, 0], 1.0)])
    h = shoot(s, [0, 2, -5], [0, 0, 1])
    assert not bool(h.found[0])


def test_sphere_inside_misses():
    # reference accepts only if BOTH roots > 0: rays from inside miss
    s = make_scene([sphere([0, 0, 0], 1.0)])
    h = shoot(s, [0, 0, 0], [0, 0, 1])
    assert not bool(h.found[0])


def test_sphere_behind_misses():
    s = make_scene([sphere([0, 0, 0], 1.0)])
    h = shoot(s, [0, 0, 5], [0, 0, 1])
    assert not bool(h.found[0])


def test_box_frontal_normal_uv():
    s = make_scene([box([0, 0, 0], [1, 1, 1])])
    h = shoot(s, [0.25, 0.5, -5], [0, 0, 1])
    assert bool(h.found[0])
    assert float(h.t[0]) == pytest.approx(4.0, rel=1e-5)
    np.testing.assert_allclose(h.norm[0], [0, 0, -1], atol=1e-5)
    # z-face (mci=2): uv = (p.y, p.x)
    np.testing.assert_allclose(h.uv[0], [0.5, 0.25], atol=1e-5)
    # dpdu for z-face is the y axis
    np.testing.assert_allclose(h.dpdu[0], [0, 1, 0], atol=1e-6)


def test_box_top_face_floorlike():
    s = make_scene([box([0, 0, 0], [5, 0.1, 5])])
    h = shoot(s, [1.0, 3.0, 2.0], [0, -1, 0])
    assert bool(h.found[0])
    assert float(h.t[0]) == pytest.approx(2.9, rel=1e-5)
    np.testing.assert_allclose(h.norm[0], [0, 1, 0], atol=1e-5)
    # y-face (mci=1): uv = (p.x, p.z), dpdu = x axis
    np.testing.assert_allclose(h.uv[0], [1.0, 2.0], atol=1e-4)
    np.testing.assert_allclose(h.dpdu[0], [1, 0, 0], atol=1e-6)


def test_box_inside_misses():
    s = make_scene([box([0, 0, 0], [1, 1, 1])])
    h = shoot(s, [0, 0, 0], [0, 0, 1])
    assert not bool(h.found[0])


def test_box_xface_degenerate_frame():
    # x-faces: dpdu parallel to normal (reference-faithful quirk)
    s = make_scene([box([0, 0, 0], [1, 2, 2])])
    h = shoot(s, [-5, 0.5, 0.5], [1, 0, 0])
    assert bool(h.found[0])
    np.testing.assert_allclose(h.norm[0], [-1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(h.dpdu[0], [1, 0, 0], atol=1e-6)


def test_triangle_hit_and_normal():
    s = make_scene([tri([0, 0, 0], [2, 0, 0], [0, 2, 0])])
    h = shoot(s, [0.5, 0.5, -3], [0, 0, 1])
    assert bool(h.found[0])
    assert float(h.t[0]) == pytest.approx(3.0, rel=1e-5)
    # normal = cross(norm(e1), norm(e2)) = cross(x, y) = z (unit here)
    np.testing.assert_allclose(h.norm[0], [0, 0, 1], atol=1e-5)


def test_triangle_unnormalized_normal():
    # skewed triangle: |cross(U,V)| = sin(angle) < 1, left unnormalized
    s = make_scene([tri([0, 0, 0], [2, 0, 0], [2, 0.5, 0])])
    h = shoot(s, [1.5, 0.2, -3], [0, 0, 1])
    assert bool(h.found[0])
    n = np.asarray(h.norm[0])
    assert 0.1 < np.linalg.norm(n) < 0.9999


def test_triangle_edge_reject():
    s = make_scene([tri([0, 0, 0], [2, 0, 0], [0, 2, 0])])
    h = shoot(s, [1.5, 1.5, -3], [0, 0, 1])  # outside hypotenuse
    assert not bool(h.found[0])


def test_closest_hit_ordering():
    s = make_scene([sphere([0, 0, 3], 1.0), sphere([0, 0, 8], 1.0)])
    h = shoot(s, [0, 0, -5], [0, 0, 1])
    assert int(h.prim[0]) == 0
    assert float(h.t[0]) == pytest.approx(7.0, rel=1e-5)


def test_shadow_ray_from_surface_self_miss():
    # a shadow ray leaving the top of a box with zero epsilon must not
    # self-intersect (tmin < 0 reject rule)
    s = make_scene([box([0, 0, 0], [5, 0.1, 5])])
    h = shoot(s, [1.0, 0.1, 2.0], [0, 1, 0])
    assert not bool(h.found[0])


def test_batched_shapes():
    s = make_scene([sphere([0, 0, 0], 1.0), box([3, 0, 0], [1, 1, 1])])
    o = jnp.zeros((64, 3)) + jnp.array([0, 0, -5.0])
    d = jnp.tile(jnp.array([[0, 0, 1.0]]), (64, 1))
    h = intersect.intersect_closest(s, o, d)
    assert h.t.shape == (64,)
    assert h.norm.shape == (64, 3)
    assert bool(h.found.all())

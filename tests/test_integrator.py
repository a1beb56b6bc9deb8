"""Integrator tests: analytic direct lighting, emission gating, MC sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plutracer_tpu.render.integrator import ray_color
from plutracer_tpu.scene import compile_scene
from plutracer_tpu.scene.types import (
    LIGHT_AREA,
    LIGHT_POINT,
    MAT_DIFFUSE,
    MAT_EMISSION,
    MAT_MIRROR,
    PRIM_BOX,
    PRIM_SPHERE,
    LightDesc,
    MaterialDesc,
    PrimDesc,
    SceneDesc,
)
from plutracer_tpu.semantics import DEFAULT_OPTIONS


def floor_point_light_scene(albedo=(0.5, 0.5, 0.5), I=(20.0, 20.0, 20.0)):
    """Diffuse floor (box top face at y=0.1) + point light at (0,5,0)."""
    d = SceneDesc()
    c = np.zeros(3, np.float32)
    e = np.array([5, 0.1, 5], np.float32)
    pid = d.add_prim(PrimDesc(PRIM_BOX, a=c - e, b=c + e))
    mid = d.add_material(
        MaterialDesc(MAT_DIFFUSE, color=np.asarray(albedo, np.float32))
    )
    d.prims[pid].material = mid
    d.add_light(
        LightDesc(LIGHT_POINT, pos=np.array([0, 5, 0], np.float32),
                  intensity=np.asarray(I, np.float32))
    )
    d.cam_pos = np.array([0, 3, 0], np.float32)
    d.cam_target = np.zeros(3, np.float32)
    return compile_scene(d)


def test_point_light_direct_analytic():
    """L = (albedo/pi) * I/r^2 * cos, exactly (delta light, no MC noise)."""
    s = floor_point_light_scene()
    o = jnp.asarray([[0.0, 3.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    L = ray_color(s, o, d, jax.random.PRNGKey(0))
    r = 5.0 - 0.1
    expect = (0.5 / np.pi) * (20.0 / r**2) * 1.0
    np.testing.assert_allclose(L[0], expect, rtol=1e-5)


def test_point_light_oblique_cos():
    s = floor_point_light_scene()
    # hit the floor at x=2: cos = 4.9/sqrt(4.9^2+4), r^2 = 4.9^2+4
    o = jnp.asarray([[2.0, 3.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    L = ray_color(s, o, d, jax.random.PRNGKey(0))
    r2 = 4.9**2 + 4.0
    cos = 4.9 / np.sqrt(r2)
    expect = (0.5 / np.pi) * (20.0 / r2) * cos
    np.testing.assert_allclose(L[0], expect, rtol=1e-5)


def test_point_light_shadowed():
    s = floor_point_light_scene()
    # add a blocker box between floor and light
    from plutracer_tpu.scene.loader import box_area  # noqa

    d = SceneDesc()
    c = np.zeros(3, np.float32)
    e = np.array([5, 0.1, 5], np.float32)
    pid = d.add_prim(PrimDesc(PRIM_BOX, a=c - e, b=c + e))
    mid = d.add_material(MaterialDesc(MAT_DIFFUSE, color=np.full(3, 0.5, np.float32)))
    d.prims[pid].material = mid
    bc = np.array([0, 2, 0], np.float32)
    be = np.array([1, 0.1, 1], np.float32)
    bid = d.add_prim(PrimDesc(PRIM_BOX, a=bc - be, b=bc + be))
    d.prims[bid].material = mid
    d.add_light(
        LightDesc(LIGHT_POINT, pos=np.array([0, 5, 0], np.float32),
                  intensity=np.full(3, 20.0, np.float32))
    )
    s2 = compile_scene(d)
    o = jnp.asarray([[0.0, 1.0, 0.0]])
    dd = jnp.asarray([[0.0, -1.0, 0.0]])
    # direct light fully blocked; bounce light can only come from other
    # diffuse surfaces which see no light either -> ~0 (one bounce up hits
    # blocker, whose underside is shadowed too)
    L = ray_color(s2, o, dd, jax.random.PRNGKey(1))
    assert float(jnp.abs(L).max()) < 1e-3


def test_area_light_emission_seen_directly():
    d = SceneDesc()
    c = np.array([0, 3, 0], np.float32)
    e = np.array([1, 0.1, 1], np.float32)
    pid = d.add_prim(PrimDesc(PRIM_BOX, a=c - e, b=c + e))
    mid = d.add_material(MaterialDesc(MAT_EMISSION))
    lid = d.add_light(
        LightDesc(LIGHT_AREA, intensity=np.array([5, 5, 4], np.float32), prim=pid)
    )
    d.prims[pid].material = mid
    d.prims[pid].light = lid
    s = compile_scene(d)
    # looking up at the bottom face: emission visible (dot(n, -d) > 0)
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    dd = jnp.asarray([[0.0, 1.0, 0.0]])
    L = ray_color(s, o, dd, jax.random.PRNGKey(0))
    np.testing.assert_allclose(L[0], [5, 5, 4], rtol=1e-5)


def test_mirror_bounces_to_light():
    """Camera -> mirror floor -> sees the area light via specular bounce."""
    d = SceneDesc()
    fc = np.zeros(3, np.float32)
    fe = np.array([5, 0.1, 5], np.float32)
    fid = d.add_prim(PrimDesc(PRIM_BOX, a=fc - fe, b=fc + fe))
    # perfect mirror: conductor with huge k -> F ~ 1... use reference quirk
    mmid = d.add_material(
        MaterialDesc(MAT_MIRROR, color=np.ones(3, np.float32),
                     eta=np.ones(3, np.float32), k=np.ones(3, np.float32))
    )
    d.prims[fid].material = mmid
    lc = np.array([0, 6, 0], np.float32)
    le = np.array([1, 0.1, 1], np.float32)
    lpid = d.add_prim(PrimDesc(PRIM_BOX, a=lc - le, b=lc + le))
    emid = d.add_material(MaterialDesc(MAT_EMISSION))
    lid = d.add_light(
        LightDesc(LIGHT_AREA, intensity=np.array([7, 7, 7], np.float32), prim=lpid)
    )
    d.prims[lpid].material = emid
    d.prims[lpid].light = lid
    s = compile_scene(d)
    # straight down onto the mirror under the light: reflects straight up
    o = jnp.asarray([[0.0, 3.0, 0.001]])
    dd = jnp.asarray([[0.0, -1.0, 0.0]])
    L = np.asarray(ray_color(s, o, dd, jax.random.PRNGKey(0))[0])
    # Fresnel (reference conductor quirk at normal incidence, eta=k=1):
    # Rparl2 = (tmp1 - 2 + 1)/(tmp1 + 2 + 1) with tmp0 = 2 -> (1)/(5) = 0.2
    # F = (0.2 + 1)/2 = 0.6 ; emitted 7 -> expect 4.2
    np.testing.assert_allclose(L, 0.6 * 7.0, rtol=1e-4)


def test_max_bounces_terminate():
    # two facing mirrors: path must terminate at 8 vertices without NaN
    d = SceneDesc()
    m = d.add_material(
        MaterialDesc(MAT_MIRROR, color=np.ones(3, np.float32),
                     eta=np.ones(3, np.float32), k=np.ones(3, np.float32))
    )
    a = d.add_prim(PrimDesc(PRIM_BOX, a=np.array([-5, -1, -5], np.float32),
                            b=np.array([5, 0, 5], np.float32)))
    b = d.add_prim(PrimDesc(PRIM_BOX, a=np.array([-5, 10, -5], np.float32),
                            b=np.array([5, 11, 5], np.float32)))
    d.prims[a].material = m
    d.prims[b].material = m
    d.add_light(
        LightDesc(LIGHT_POINT, pos=np.array([0, 20, 0], np.float32),
                  intensity=np.ones(3, np.float32))
    )
    s = compile_scene(d)
    o = jnp.asarray([[0.0, 5.0, 0.0]])
    dd = jnp.asarray([[0.0, -1.0, 0.0]])
    L = ray_color(s, o, dd, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(L).all())


def test_batched_jit():
    s = floor_point_light_scene()
    o = jnp.tile(jnp.asarray([[0.0, 3.0, 0.0]]), (256, 1))
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (256, 1))
    f = jax.jit(lambda s, o, d, k: ray_color(s, o, d, k))
    L = f(s, o, d, jax.random.PRNGKey(0))
    assert L.shape == (256, 3)
    r = 4.9
    expect = (0.5 / np.pi) * (20.0 / r**2)
    np.testing.assert_allclose(L, expect, rtol=1e-4)

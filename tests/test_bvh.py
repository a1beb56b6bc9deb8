"""BVH tests: the traversal must agree with brute force exactly (modulo float32 fusion ordering in t)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plutracer_tpu.ops import intersect
from plutracer_tpu.ops.bvh import build_bvh, bvh_closest
from plutracer_tpu.scene import compile_scene, load_scene_file
from plutracer_tpu.scene.types import (
    MAT_DIFFUSE,
    PRIM_SPHERE,
    MaterialDesc,
    PrimDesc,
    SceneDesc,
)


def random_rays(key, n, spread=10.0):
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (n, 3), minval=-spread, maxval=spread)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("name", ["cornell-box", "room", "refrac0", "test1"])
def test_bvh_matches_bruteforce(name):
    d = load_scene_file(f"/root/reference/scenes/{name}.urn", ["/res", "8x8"])
    s = compile_scene(d)
    bvh = build_bvh(s)
    o, dd = random_rays(jax.random.PRNGKey(0), 512)
    f_b, p_b, t_b = intersect.intersect_lite(s, o, dd)
    f_v, p_v, t_v = bvh_closest(s, bvh, o, dd)
    np.testing.assert_array_equal(np.asarray(f_b), np.asarray(f_v))
    hit = np.asarray(f_b)
    np.testing.assert_array_equal(np.asarray(p_b)[hit], np.asarray(p_v)[hit])
    np.testing.assert_allclose(np.asarray(t_b)[hit], np.asarray(t_v)[hit], rtol=1e-5)


def test_bvh_random_sphere_cloud():
    rng = np.random.default_rng(7)
    d = SceneDesc()
    mid = d.add_material(MaterialDesc(MAT_DIFFUSE, color=np.ones(3, np.float32)))
    for _ in range(300):
        c = rng.uniform(-20, 20, 3).astype(np.float32)
        r = float(rng.uniform(0.1, 1.5))
        pid = d.add_prim(
            PrimDesc(PRIM_SPHERE, a=c, b=np.array([r, 0, 0], np.float32))
        )
        d.prims[pid].material = mid
    s = compile_scene(d)
    bvh = build_bvh(s)
    assert bvh.num_nodes == 2 * 300 - 1  # binary tree with 1 prim per leaf
    o, dd = random_rays(jax.random.PRNGKey(3), 1024, spread=25.0)
    f_b, p_b, t_b = intersect.intersect_lite(s, o, dd)
    f_v, p_v, t_v = bvh_closest(s, bvh, o, dd)
    np.testing.assert_array_equal(np.asarray(f_b), np.asarray(f_v))
    hit = np.asarray(f_b)
    np.testing.assert_array_equal(np.asarray(p_b)[hit], np.asarray(p_v)[hit])
    np.testing.assert_allclose(np.asarray(t_b)[hit], np.asarray(t_v)[hit], rtol=1e-5)


def test_bvh_single_prim():
    d = SceneDesc()
    mid = d.add_material(MaterialDesc(MAT_DIFFUSE))
    pid = d.add_prim(
        PrimDesc(PRIM_SPHERE, a=np.zeros(3, np.float32),
                 b=np.array([1, 0, 0], np.float32))
    )
    d.prims[pid].material = mid
    s = compile_scene(d)
    bvh = build_bvh(s)
    assert bvh.num_nodes == 1
    o = jnp.asarray([[0.0, 0.0, -5.0]])
    dd = jnp.asarray([[0.0, 0.0, 1.0]])
    f, p, t = bvh_closest(s, bvh, o, dd)
    assert bool(f[0]) and float(t[0]) == pytest.approx(4.0, rel=1e-6)

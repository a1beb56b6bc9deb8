"""Math-core utility tests (ops/geometry.py) + our own demo scenes."""

import jax.numpy as jnp
import numpy as np
import pytest

from plutracer_tpu.ops.geometry import Aabb, ray_at, ray_transform


def test_ray_at():
    p = ray_at(jnp.asarray([0.0, 0, 0]), jnp.asarray([0.0, 0, 1]), 2.5)
    np.testing.assert_allclose(p, [0, 0, 2.5])


def test_ray_transform():
    m = jnp.asarray(
        [[0.0, -1, 0, 1], [1, 0, 0, 2], [0, 0, 1, 3], [0, 0, 0, 1]]
    )  # rotate z 90deg + translate
    o, d = ray_transform(jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 1, 0]), m)
    np.testing.assert_allclose(o, [1, 3, 3], atol=1e-6)
    np.testing.assert_allclose(d, [-1, 0, 0], atol=1e-6)  # direction: no translate


def test_aabb_union_contains():
    a = Aabb(jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 1, 1]))
    b = Aabb(jnp.asarray([2.0, 2, 2]), jnp.asarray([3.0, 3, 3]))
    u = a.union(b)
    np.testing.assert_allclose(u.lo, [0, 0, 0])
    np.testing.assert_allclose(u.hi, [3, 3, 3])
    assert bool(u.contains(jnp.asarray([1.5, 1.5, 1.5])))
    assert not bool(a.contains(jnp.asarray([1.5, 0.5, 0.5])))
    assert bool(a.contains(jnp.asarray([1.0, 1.0, 1.0])))  # inclusive edges


def test_aabb_inside_of():
    a = Aabb(jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 1, 1]))
    big = Aabb(jnp.asarray([-1.0, -1, -1]), jnp.asarray([2.0, 2, 2]))
    far = Aabb(jnp.asarray([5.0, 5, 5]), jnp.asarray([6.0, 6, 6]))
    assert bool(a.inside_of(big))
    assert not bool(a.inside_of(far))


def test_aabb_hit_and_interval():
    a = Aabb(jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]))
    o = jnp.asarray([0.0, 0, -5])
    d = jnp.asarray([0.0, 0, 1])
    assert bool(a.hit(o, d))
    tmin, tmax = a.hit_retint(o, d)
    assert float(tmin) == pytest.approx(4.0)
    assert float(tmax) == pytest.approx(6.0)
    # reference quirk: boxes fully BEHIND the ray still "hit" (no t check)
    assert bool(a.hit(jnp.asarray([0.0, 0, 5]), d))


def test_aabb_transform():
    a = Aabb(jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 2, 3]))
    m = jnp.asarray(
        [[2.0, 0, 0, 1], [0, 2, 0, 1], [0, 0, 2, 1], [0, 0, 0, 1]]
    )
    t = a.transform(m)
    np.testing.assert_allclose(t.lo, [1, 1, 1])
    np.testing.assert_allclose(t.hi, [3, 5, 7])


def test_surface_area():
    a = Aabb(jnp.asarray([0.0, 0, 0]), jnp.asarray([2.0, 3, 4]))
    assert float(a.surface_area()) == pytest.approx(2 * (6 + 8 + 12))


# ---------------- our own demo scenes load and render ----------------

import pathlib

DEMOS = sorted((pathlib.Path(__file__).parent.parent / "scenes").glob("*.urn"))


@pytest.mark.parametrize("path", DEMOS, ids=lambda p: p.stem)
def test_demo_scene_renders(path):
    import jax

    from plutracer_tpu.render.renderer import render
    from plutracer_tpu.scene import compile_scene, load_scene_file

    d = load_scene_file(str(path), ["/res", "32x24", "/smp", "1"])
    s = compile_scene(d)
    img = np.asarray(render(s, 32, 24, 1, jax.random.PRNGKey(0)))
    assert np.isfinite(img).all()
    assert img.max() > 0

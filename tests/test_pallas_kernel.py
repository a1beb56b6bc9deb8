"""Pallas intersect kernel vs the XLA brute-force oracle (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plutracer_tpu.ops import intersect
from plutracer_tpu.ops.pallas.intersect_kernel import (
    intersect_lite_pallas,
    pack_prims,
)
from plutracer_tpu.scene import compile_scene, load_scene_file


def random_rays(key, n, spread=12.0):
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (n, 3), minval=-spread, maxval=spread)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("name", ["cornell-box", "room", "refrac0", "test1"])
def test_pallas_matches_xla(name):
    d = load_scene_file(f"/root/reference/scenes/{name}.urn", ["/res", "8x8"])
    s = compile_scene(d)
    o, dd = random_rays(jax.random.PRNGKey(1), 512)
    f_x, p_x, t_x = intersect.intersect_lite(s, o, dd)
    f_p, p_p, t_p = intersect_lite_pallas(s, o, dd, interpret=True)
    np.testing.assert_array_equal(np.asarray(f_x), np.asarray(f_p))
    hit = np.asarray(f_x)
    np.testing.assert_array_equal(np.asarray(p_x)[hit], np.asarray(p_p)[hit])
    np.testing.assert_allclose(
        np.asarray(t_x)[hit], np.asarray(t_p)[hit], rtol=1e-5
    )


def test_pallas_ray_padding():
    # non-multiple-of-4096 batch exercises the padding path
    d = load_scene_file("/root/reference/scenes/cornell-box.urn", ["/res", "8x8"])
    s = compile_scene(d)
    o, dd = random_rays(jax.random.PRNGKey(2), 100)
    f_x, p_x, t_x = intersect.intersect_lite(s, o, dd)
    f_p, p_p, t_p = intersect_lite_pallas(s, o, dd, interpret=True)
    np.testing.assert_array_equal(np.asarray(f_x), np.asarray(f_p))


def test_pack_prims_partitioned_layout():
    """pack_prims partitions by type (one type per 8-row chunk), pads each
    segment to a chunk multiple, and carries original row ids in col 10."""
    d = load_scene_file("/root/reference/scenes/cornell-box.urn", ["/res", "8x8"])
    s = compile_scene(d)
    packed = np.asarray(pack_prims(s))
    assert packed.shape[0] % 8 == 0
    # chunk-uniform types, ordered sphere < box < triangle
    chunk_types = packed[::8, 0]
    for c in range(packed.shape[0] // 8):
        assert (packed[8 * c : 8 * c + 8, 0] == chunk_types[c]).all()
    assert (np.diff(chunk_types) >= 0).all()
    # every original row appears exactly once among non-padding rows
    ptype = np.asarray(s.prim_type)
    ids = []
    for t in (0, 1, 2):
        n = int((ptype == t).sum())
        seg_rows = packed[packed[:, 0] == t]
        ids += list(seg_rows[:n, 10].astype(int))
    assert sorted(ids) == list(range(ptype.shape[0]))

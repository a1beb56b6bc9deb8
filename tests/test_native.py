"""Native C++ components vs their Python semantic oracles."""

import textwrap

import numpy as np
import pytest

from plutracer_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")
    return True


def test_native_bvh_matches_python(lib_ok):
    from plutracer_tpu.ops.bvh import build_bvh
    from plutracer_tpu.scene import compile_scene, load_scene_file

    d = load_scene_file("/root/reference/scenes/test1.urn", ["/res", "8x8"])
    s = compile_scene(d, build_accel=False)
    py = build_bvh(s, use_native=False)
    nat = build_bvh(s, use_native=True)
    np.testing.assert_array_equal(np.asarray(py.node_skip), np.asarray(nat.node_skip))
    np.testing.assert_array_equal(np.asarray(py.node_prim), np.asarray(nat.node_prim))
    np.testing.assert_allclose(np.asarray(py.node_min), np.asarray(nat.node_min))
    np.testing.assert_allclose(np.asarray(py.node_max), np.asarray(nat.node_max))


def test_native_obj_matches_python(lib_ok, tmp_path):
    obj = textwrap.dedent(
        """
        # a quad as two triangles with normals and uvs
        v 0 0 0
        v 1 0 0
        v 1 1 0
        v 0 1 0
        vn 0 0 1
        vt 0 0
        vt 1 0
        vt 1 1
        vt 0 1
        f 1/1/1 2/2/1 3/3/1
        f 1/1/1 3/3/1 4/4/1
        f 1//1 2//1 4//1
        f 1 2 4
        """
    )
    p = tmp_path / "quad.obj"
    p.write_text(obj)
    from plutracer_tpu.scene.obj import load_obj, load_obj_python

    py = load_obj_python(str(p))
    nat = load_obj(str(p), use_native=True)
    assert py.positions.shape == nat.positions.shape == (4, 3, 3)
    np.testing.assert_allclose(py.positions, nat.positions)
    np.testing.assert_allclose(py.normals, nat.normals)
    np.testing.assert_allclose(py.texcoords, nat.texcoords)


def test_native_bvh_large_cloud(lib_ok):
    from plutracer_tpu.ops.bvh import build_bvh
    from plutracer_tpu.scene import compile_scene
    from plutracer_tpu.scene.types import (
        MAT_DIFFUSE,
        PRIM_TRIANGLE,
        MaterialDesc,
        PrimDesc,
        SceneDesc,
    )

    rng = np.random.default_rng(0)
    d = SceneDesc()
    mid = d.add_material(MaterialDesc(MAT_DIFFUSE))
    for _ in range(2000):
        v0 = rng.uniform(-50, 50, 3).astype(np.float32)
        pid = d.add_prim(
            PrimDesc(
                PRIM_TRIANGLE,
                a=v0,
                b=v0 + rng.uniform(-1, 1, 3).astype(np.float32),
                c=v0 + rng.uniform(-1, 1, 3).astype(np.float32),
            )
        )
        d.prims[pid].material = mid
    s = compile_scene(d, build_accel=False)
    py = build_bvh(s, use_native=False)
    nat = build_bvh(s, use_native=True)
    np.testing.assert_array_equal(np.asarray(py.node_prim), np.asarray(nat.node_prim))
    np.testing.assert_array_equal(np.asarray(py.node_skip), np.asarray(nat.node_skip))

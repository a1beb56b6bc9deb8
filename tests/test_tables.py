"""Packed-table gather tiers (ops/tables): the select-chain (P<=16),
one-hot-matmul (P<=ONEHOT_MAX) and native-gather tiers must agree with
table[idx] exactly, including the documented clamp semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plutracer_tpu.ops import tables


@pytest.mark.parametrize("P", [1, 3, 16, 17, 64, 259, tables._ONEHOT_MAX, 1000])
def test_rows_matches_native_gather(P):
    key = jax.random.PRNGKey(P)
    table = jax.random.normal(key, (P, 7)) * 100.0
    idx = jax.random.randint(jax.random.fold_in(key, 1), (513,), 0, P)
    got = tables._rows(table, idx)
    want = table[idx]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("P", [8, 64, 1000])
def test_rows_clamps_out_of_range(P):
    """Negatives clamp to row 0 (NOT jnp wrap-around); overflow to P-1."""
    table = jnp.arange(P * 2, dtype=jnp.float32).reshape(P, 2)
    idx = jnp.array([-5, -1, 0, P - 1, P, P + 7], jnp.int32)
    got = np.asarray(tables._rows(table, idx))
    want = np.asarray(table)[np.clip(np.asarray(idx), 0, P - 1)]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("P", [8, 64])
def test_col_matches_rows(P):
    key = jax.random.PRNGKey(P + 100)
    table = jax.random.normal(key, (P, 5))
    idx = jax.random.randint(jax.random.fold_in(key, 1), (257,), -2, P + 2)
    got = np.asarray(tables._col(table, idx, 3))
    want = np.asarray(tables._rows(table, idx))[:, 3]
    np.testing.assert_array_equal(got, want)


def test_rows_grad_is_scatter_add():
    """d/dtable of sum(rows) equals the gather's scatter-add in every tier."""
    for P in (8, 64, 1000):
        table = jnp.ones((P, 3))
        idx = jnp.array([0, 0, min(5, P - 1), P - 1], jnp.int32)
        g = jax.grad(lambda t: tables._rows(t, idx).sum())(table)
        want = np.zeros((P, 3))
        for i in np.asarray(idx):
            want[i] += 1.0
        np.testing.assert_allclose(np.asarray(g), want, atol=1e-6)


def test_nonfinite_scene_rejected():
    """compile_scene refuses NaN/Inf data (the one-hot tier assumes finite
    tables: 0 * inf would poison whole batches)."""
    from plutracer_tpu.scene.compile import compile_scene
    from plutracer_tpu.scene.types import (
        MAT_DIFFUSE, PRIM_SPHERE, MaterialDesc, PrimDesc, SceneDesc,
    )

    desc = SceneDesc(resolution=(8, 8))
    m = desc.add_material(
        MaterialDesc(MAT_DIFFUSE, color=np.array([np.inf, 0, 0], np.float32))
    )
    desc.add_prim(
        PrimDesc(PRIM_SPHERE, np.zeros(3, np.float32),
                 np.array([1, 0, 0], np.float32), material=m)
    )
    with pytest.raises(ValueError, match="non-finite"):
        compile_scene(desc)

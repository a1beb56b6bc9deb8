"""Sharded rendering + training tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plutracer_tpu.parallel import make_mesh, make_train_step, render_sharded
from plutracer_tpu.parallel.sharded import apply_params, get_params
from plutracer_tpu.render.renderer import render
from plutracer_tpu.scene import compile_scene, load_scene_file


@pytest.fixture(scope="module")
def scene():
    d = load_scene_file("/root/reference/scenes/minimal1.urn", ["/res", "32x24"])
    return compile_scene(d)


def test_mesh_shapes(eight_devices):
    m = make_mesh()
    assert m.shape["tiles"] == 8 and m.shape["spp"] == 1
    m2 = make_mesh((4, 2))
    assert m2.shape["tiles"] == 4 and m2.shape["spp"] == 2


def test_sharded_render_matches_mean(scene, eight_devices):
    """Sharded render must be a valid estimator of the same image: compare
    against the single-device renderer at higher spp with loose tolerance."""
    m = make_mesh((4, 2))
    img_sh = render_sharded(scene, 32, 24, 4, jax.random.PRNGKey(0), m)
    img_ref = render(scene, 32, 24, 4, jax.random.PRNGKey(1))
    a = np.asarray(img_sh)
    b = np.asarray(img_ref)
    assert a.shape == (24, 32, 3)
    assert np.isfinite(a).all()
    # MC estimates of the same integrand: means should agree within noise
    assert abs(a.mean() - b.mean()) < 0.15 * max(b.mean(), 1e-3)


def test_sharded_render_tiles_only(scene, eight_devices):
    m = make_mesh((8, 1))
    img = render_sharded(scene, 32, 24, 2, jax.random.PRNGKey(0), m)
    assert np.isfinite(np.asarray(img)).all()


def test_train_step_reduces_loss(scene, eight_devices):
    m = make_mesh((4, 2))
    # target: render with TRUE albedo; start from perturbed albedo
    target = render(scene, 32, 24, 3, jax.random.PRNGKey(5))
    target_flat = jnp.asarray(np.asarray(target).reshape(-1, 3))
    step = make_train_step(scene, 32, 24, 3, m)
    true_params = get_params(scene)
    params = dict(true_params)
    params["mat_color"] = params["mat_color"] * 0.3
    opt_state = step.init(params)
    losses = []
    for i in range(8):
        params, opt_state, loss = step(
            params, opt_state, target_flat, jax.random.PRNGKey(100 + i),
            jnp.int32(i % 9),
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_gradients_flow_to_emission(scene, eight_devices):
    """d(loss)/d(light_intensity) must be nonzero: emission is reachable."""
    import jax

    from plutracer_tpu.parallel.sharded import _trace_stratum

    params = get_params(scene)

    def loss(params):
        sc = apply_params(scene, params)
        from plutracer_tpu.render.renderer import pixel_centers

        px = pixel_centers(32, 24)
        c = _trace_stratum(sc, px, jnp.int32(0), 2, jax.random.PRNGKey(0),
                           __import__("plutracer_tpu.semantics", fromlist=["DEFAULT_OPTIONS"]).DEFAULT_OPTIONS)
        return jnp.sum(c)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["light_intensity"]).max()) > 0
    assert float(jnp.abs(g["mat_color"]).max()) > 0

"""All intersect backends must render the same image (same seed)."""

import jax
import numpy as np
import pytest

from plutracer_tpu.render.renderer import render
from plutracer_tpu.scene import compile_scene, load_scene_file
from plutracer_tpu.semantics import DEFAULT_OPTIONS


@pytest.fixture(scope="module")
def scene():
    d = load_scene_file("/root/reference/scenes/cornell-box.urn", ["/res", "24x24"])
    return compile_scene(d)


def _render(scene, backend, n=1):
    opts = DEFAULT_OPTIONS.replace(intersect_backend=backend)
    return np.asarray(
        render(scene, 24, 24, n, jax.random.PRNGKey(9), options=opts)
    )


def test_bvh_backend_matches_xla(scene):
    """Backends agree exactly per-query (see test_bvh.py), but ulp-level t
    differences amplify chaotically over 8 MC bounces, so full images are
    compared statistically at higher spp."""
    a = _render(scene, "xla", n=6)
    b = _render(scene, "bvh", n=6)
    la, lb = np.log1p(np.maximum(a, 0)), np.log1p(np.maximum(b, 0))
    diff = np.abs(la - lb)
    assert np.quantile(diff, 0.95) < 0.1, np.quantile(diff, 0.95)
    assert abs(a.mean() - b.mean()) < 0.05 * max(a.mean(), 1e-3)


def test_grad_through_bvh_backend(scene):
    import jax.numpy as jnp

    from plutracer_tpu.parallel.sharded import apply_params, get_params
    from plutracer_tpu.render.renderer import render_pass

    opts = DEFAULT_OPTIONS.replace(intersect_backend="bvh")
    params = get_params(scene)

    def loss(params):
        sc = apply_params(scene, params)
        img = render_pass(sc, jax.random.PRNGKey(0), jnp.int32(0), 24, 24, 1, opts)
        return jnp.sum(jnp.minimum(img, 20.0) ** 2)

    g = jax.grad(loss)(params)
    assert bool(jnp.isfinite(g["mat_color"]).all())
    assert float(jnp.abs(g["mat_color"]).max()) > 0

"""BSDF tests: frames, Fresnel quirks, sampling laws, energy checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plutracer_tpu.ops import bsdf as B
from plutracer_tpu.scene.types import (
    MAT_DIFFUSE,
    MAT_EMISSION,
    MAT_GLASS,
    MAT_MIRROR,
    MAT_REFRACT,
)


def mk_frame(n=(0, 0, 1), dpdu=(1, 0, 0), batch=1):
    norm = jnp.tile(jnp.asarray([n], jnp.float32), (batch, 1))
    du = jnp.tile(jnp.asarray([dpdu], jnp.float32), (batch, 1))
    return B.make_frame(norm, du)


def test_frame_roundtrip():
    f = mk_frame(n=(0, 1, 0), dpdu=(1, 0, 0))
    v = jnp.asarray([[0.3, 0.5, -0.7]])
    loc = B.w2l(f, v)
    back = B.l2w(f, loc)
    np.testing.assert_allclose(back, v, atol=1e-6)
    # local z is the normal component
    assert float(loc[0, 2]) == pytest.approx(0.5)


def test_lambert_F_nee_hemisphere_gate():
    albedo = jnp.asarray([[0.6, 0.3, 0.2]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    mtype = jnp.asarray([MAT_DIFFUSE])
    wo = jnp.asarray([[0.0, 0.0, 1.0]])
    wi_same = jnp.asarray([[0.3, 0.0, 0.95]])
    wi_opp = jnp.asarray([[0.3, 0.0, -0.95]])
    f1 = B.bsdf_F_nee(mtype, albedo, n, wo, wi_same)
    f2 = B.bsdf_F_nee(mtype, albedo, n, wo, wi_opp)
    np.testing.assert_allclose(f1, albedo / np.pi, rtol=1e-6)
    np.testing.assert_allclose(f2, 0.0)


def test_specular_F_nee_zero():
    albedo = jnp.ones((1, 3))
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    for mt in (MAT_MIRROR, MAT_REFRACT, MAT_GLASS, MAT_EMISSION):
        f = B.bsdf_F_nee(jnp.asarray([mt]), albedo, n, n, n)
        np.testing.assert_allclose(f, 0.0)


def _sample(mtype, wo, u_sel=0.25, u2=(0.3, 0.7), eta=(0, 0, 0), k=(0, 0, 0),
            albedo=(1, 1, 1), nonspec=False):
    f = mk_frame()
    return B.bsdf_sample(
        f,
        jnp.asarray([mtype]),
        jnp.asarray([albedo], jnp.float32),
        jnp.asarray([eta], jnp.float32),
        jnp.asarray([k], jnp.float32),
        jnp.asarray([wo], jnp.float32),
        jnp.asarray([u_sel], jnp.float32),
        jnp.asarray([u2], jnp.float32),
        non_specular_only=nonspec,
    )


def test_mirror_reflects():
    wo = [0.5, 0.3, 0.81]
    s = _sample(MAT_MIRROR, wo, eta=(1.4, 1.4, 1.4), k=(1, 1, 1))
    np.testing.assert_allclose(s.wwi[0], [-0.5, -0.3, 0.81], atol=1e-6)
    assert float(s.pdf[0]) == 1.0
    assert bool(s.is_specular[0])


def test_conductor_fresnel_rperp_quirk():
    # reference Rperp2 == 1 -> F = (Rparl2 + 1)/2 >= 0.5 always
    fr = B.fresnel_conductor(jnp.asarray([0.9]), jnp.ones((1, 3)) * 1.4, jnp.ones((1, 3)))
    assert float(fr.min()) >= 0.5


def test_refraction_snell():
    # straight-on entering: wi goes straight through with negative z
    wo = [0.0, 0.0, 1.0]
    s = _sample(MAT_REFRACT, wo, eta=(1.0, 1.5, 0.0))
    np.testing.assert_allclose(s.wwi[0], [0, 0, -1], atol=1e-6)
    assert float(s.pdf[0]) == 1.0
    # oblique: check Snell sin_t = (et/ei) sin_i with entering eta = 1/1.5
    wo = [0.6, 0.0, 0.8]
    s = _sample(MAT_REFRACT, wo, eta=(1.0, 1.5, 0.0))
    wi = np.asarray(s.wwi[0])
    sin_i = 0.6
    sin_t = sin_i / 1.5
    assert wi[0] == pytest.approx(-sin_t, abs=1e-6)
    assert wi[2] == pytest.approx(-np.sqrt(1 - sin_t**2), abs=1e-6)


def test_tir_kills_sample():
    # exiting a dense medium at a grazing angle: eta = 1.5, sin_i = 0.9
    wo = [0.9, 0.0, -np.sqrt(1 - 0.81)]  # wo.z < 0: inside
    s = _sample(MAT_REFRACT, wo, eta=(1.0, 1.5, 0.0))
    assert float(s.pdf[0]) == 0.0
    np.testing.assert_allclose(s.f[0], 0.0)


def test_glass_component_choice():
    wo = [0.3, 0.0, 0.954]
    refl = _sample(MAT_GLASS, wo, u_sel=0.2, eta=(1.4, 0, 0))
    trans = _sample(MAT_GLASS, wo, u_sel=0.8, eta=(1.4, 0, 0))
    assert float(refl.pdf[0]) == 0.5 and float(trans.pdf[0]) == 0.5
    np.testing.assert_allclose(refl.wwi[0][:2], [-0.3, 0.0], atol=1e-6)
    assert float(trans.wwi[0][2]) < 0.0  # refracted through


def test_emission_dead():
    s = _sample(MAT_EMISSION, [0, 0, 1.0])
    assert float(s.pdf[0]) == 0.0


def test_nonspec_only_masks_specular():
    for mt in (MAT_MIRROR, MAT_REFRACT, MAT_GLASS):
        s = _sample(mt, [0, 0, 1.0], eta=(1.4, 1.4, 0), nonspec=True)
        assert float(s.pdf[0]) == 0.0


def test_lambert_cosine_sampling_statistics():
    # E[f * cos / pdf] over cosine-hemisphere samples = albedo (white furnace)
    n = 4096
    key = jax.random.PRNGKey(0)
    u2 = jax.random.uniform(key, (n, 2))
    frame = mk_frame(batch=n)
    albedo = jnp.tile(jnp.asarray([[0.7, 0.5, 0.3]]), (n, 1))
    s = B.bsdf_sample(
        frame,
        jnp.full((n,), MAT_DIFFUSE),
        albedo,
        jnp.zeros((n, 3)),
        jnp.zeros((n, 3)),
        jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
        jax.random.uniform(jax.random.PRNGKey(1), (n,)),
        u2,
    )
    cos = jnp.abs(s.wwi[:, 2])
    est = (s.f * (cos / s.pdf)[:, None]).mean(0)
    np.testing.assert_allclose(est, [0.7, 0.5, 0.3], rtol=0.05)
    # sampled directions lie in the upper hemisphere
    assert float(s.wwi[:, 2].min()) >= 0.0


def test_lambert_flips_into_wo_hemisphere():
    s = _sample(MAT_DIFFUSE, [0.0, 0.0, -1.0], albedo=(0.5, 0.5, 0.5))
    assert float(s.wwi[0, 2]) <= 0.0
    assert float(s.pdf[0]) > 0.0


def test_glass_fresnel_tir_from_outside():
    # swap-on-entering quirk: from OUTSIDE at grazing angle the dielectric
    # Fresnel evaluates with eta 1.5 and reports total reflection
    fr = B.fresnel_dielectric_eval(
        jnp.asarray([0.2]), jnp.asarray([1.0]), jnp.asarray([1.5])
    )
    np.testing.assert_allclose(fr[0], 1.0)

"""Branchless BSDF table: eval / sample / pdf per material type.

The reference allocates polymorphic bxdf objects per hit from an arena
(inc/material.h); here each material type's math is evaluated for the whole
ray batch and combined with masked selects on mat_type.

Shading frame (inc/material.h:166-187): N = hit normal, S = normalize(dpdu),
T = cross(N, S). For box x-faces dpdu is parallel to N (see ops/intersect),
making the frame degenerate — reference-faithful.

Faithfully replicated reference details:
- fresnel_conductor's Rperp2 expression has identical numerator and
  denominator (inc/material.h:40-43), so Rperp2 == 1 and the conductor
  Fresnel is (Rparl2 + 1)/2.
- fresnel_dielectric::operator() swaps (eta_i, eta_t) when *entering*
  (inc/material.h:95-105), so for glass(1, ior) the TIR test from outside
  uses sin_t = ior * sin_i.
- specular_transmission's constructor wires (et, ei) into
  fresnel_dielectric(i=et, t=ei) (inc/material.h:130-133); the effective
  entering ratio is eta = et_ctor / ei_ctor.
- bsdf::F sums only non-specular components after stripping
  reflection/transmission by the world-space hemisphere test
  (src/material.cpp:5-16); with this material set only lambert survives,
  and lambert's F is direction-independent, so the reference's wi-from-wwo
  typo (material.cpp:6) is behavior-neutral.
- bsdf::sampleF picks uniformly among matching components and divides the
  pdf by the match count (src/material.cpp:17-55); glass's two specular
  components each get pdf 1/2.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from plutracer_tpu.ops import safemath
from plutracer_tpu.ops.sampling import cosine_hemisphere_sample
from plutracer_tpu.scene.types import (
    MAT_DIFFUSE,
    MAT_EMISSION,
    MAT_GLASS,
    MAT_MIRROR,
    MAT_REFRACT,
)

INV_PI = 1.0 / jnp.pi


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    # guarded rsqrt: plain rsqrt's derivative overflows f32 below
    # |v|^2 ~ 5e-26 (degenerate dpdu frames) — see ops/safemath.py
    return v * safemath.safe_rsqrt(jnp.sum(v * v, -1, keepdims=True) + 1e-30)


def safe_sqrt(x):
    return jnp.sqrt(jnp.where(x > 0.0, x, 1.0)) * jnp.where(x > 0.0, 1.0, 0.0)


class Frame(NamedTuple):
    s: jnp.ndarray
    t: jnp.ndarray
    n: jnp.ndarray


def make_frame(norm, dpdu) -> Frame:
    n = norm
    s = _normalize(dpdu)
    t = jnp.cross(n, s)
    return Frame(s=s, t=t, n=n)


def w2l(f: Frame, v):
    return jnp.stack([_dot(v, f.s), _dot(v, f.t), _dot(v, f.n)], -1)


def l2w(f: Frame, v):
    return (
        f.s * v[..., 0:1] + f.t * v[..., 1:2] + f.n * v[..., 2:3]
    )


# ---------------------------------------------------------------------------
# Fresnel
# ---------------------------------------------------------------------------


def fresnel_dielectric_formula(cos_i, cos_t, etai, etat):
    rparl = (etat * cos_i - etai * cos_t) / (etat * cos_i + etai * cos_t)
    rperp = (etai * cos_i - etat * cos_t) / (etai * cos_i + etat * cos_t)
    return (rparl * rparl + rperp * rperp) * 0.5


def fresnel_conductor(cos_i, eta, k):
    """Reference formula incl. the Rperp2 == 1 quirk (inc/material.h:36-45).
    cos_i already abs()'d by the caller (fresnel_conductor::operator())."""
    ci = jnp.abs(cos_i)[..., None]
    tmp0 = eta * eta + k * k
    tmp1 = tmp0 * ci * ci
    rparl2 = (tmp1 - 2.0 * eta * ci + 1.0) / (tmp1 + 2.0 * eta * ci + 1.0)
    rperp2 = jnp.ones_like(rparl2)
    return (rparl2 + rperp2) * 0.5


def fresnel_dielectric_eval(cos_i, fr_eta_i, fr_eta_t):
    """fresnel_dielectric::operator() (inc/material.h:95-105): swap the
    index pair when entering (cos_i > 0)."""
    ci = jnp.clip(cos_i, -1.0, 1.0)
    entering = ci > 0.0
    # guard zero indices: non-dielectric material rows carry eta = 0 and are
    # masked out downstream, but 0/0 here would poison gradients
    fr_eta_i = jnp.where(fr_eta_i == 0.0, 1.0, fr_eta_i)
    fr_eta_t = jnp.where(fr_eta_t == 0.0, 1.0, fr_eta_t)
    ei = jnp.where(entering, fr_eta_t, fr_eta_i)
    et = jnp.where(entering, fr_eta_i, fr_eta_t)
    sin_t = ei / et * safe_sqrt(1.0 - ci * ci)
    tir = sin_t >= 1.0
    cos_t = safe_sqrt(1.0 - sin_t * sin_t)
    f = fresnel_dielectric_formula(
        jnp.abs(ci)[..., None], cos_t[..., None], ei[..., None], et[..., None]
    )
    return jnp.where(tir[..., None], 1.0, f)


# ---------------------------------------------------------------------------
# NEE-facing eval/pdf (types = all & ~specular: only lambert participates)
# ---------------------------------------------------------------------------


def bsdf_F_nee(mtype, albedo, n_world, wwo, wwi):
    """bsdf::F with non-specular types: lambert R/pi gated by the
    world-space hemisphere test (transmission stripped when wi,wo are on the
    same side; reflection stripped otherwise)."""
    same_side = _dot(wwi, n_world) * _dot(wwo, n_world) > 0.0
    diffuse = (mtype == MAT_DIFFUSE) & same_side
    return jnp.where(diffuse[..., None], albedo * INV_PI, 0.0)


def bsdf_pdf_nee(frame: Frame, mtype, wwo, wwi):
    """bsdf::pdf averaged over matching non-specular components: lambert's
    default cosine pdf (inc/material.h:67-70) in the local frame."""
    wo = w2l(frame, wwo)
    wi = w2l(frame, wwi)
    same_hemi = wo[..., 2] * wi[..., 2] > 0.0
    cos_pdf = jnp.where(same_hemi, jnp.abs(wi[..., 2]) * INV_PI, 0.0)
    return jnp.where(mtype == MAT_DIFFUSE, cos_pdf, 0.0)


# ---------------------------------------------------------------------------
# sampling (bsdf::sampleF)
# ---------------------------------------------------------------------------


class BsdfSample(NamedTuple):
    f: jnp.ndarray  # (B,3) bsdf value
    wwi: jnp.ndarray  # (B,3) world-space sampled direction
    pdf: jnp.ndarray  # (B,)
    is_specular: jnp.ndarray  # (B,) bool: sampled component is specular


def bsdf_sample(
    frame: Frame,
    mtype,
    albedo,
    eta3,
    k3,
    wwo,
    u_select,
    u2,
    non_specular_only: bool = False,
) -> BsdfSample:
    """Sample the BSDF. eta3/k3 are the material's packed (M,3) eta/k rows:
    MIRROR uses (eta, k) as conductor params; REFRACT packs (eta_t, eta_i);
    GLASS packs (ior,...). u_select picks among matching components,
    u2 feeds the cosine-hemisphere sample for lambert.
    """
    wo = w2l(frame, wwo)
    cos_wo = wo[..., 2]

    # --- lambert: cosine hemisphere, flipped into wo's hemisphere ---
    # detached sampling: direction choices are measure-preserving and carry
    # no useful gradient for material/emission params; detaching avoids
    # second-order terms and NaNs through the concentric-disk map
    u2 = jax.lax.stop_gradient(u2)
    wi_d = cosine_hemisphere_sample(u2)
    flip = jnp.where(cos_wo < 0.0, -1.0, 1.0)
    wi_d = wi_d * jnp.stack([jnp.ones_like(flip), jnp.ones_like(flip), flip], -1)
    pdf_d = jnp.abs(wi_d[..., 2]) * INV_PI
    wwi_d = l2w(frame, wi_d)
    # recompute f over matching comps with world hemisphere mask
    # (material.cpp:46-53): for a single lambert this keeps R/pi when
    # reflection survives the mask
    same_side_d = _dot(wwi_d, frame.n) * _dot(wwo, frame.n) > 0.0
    f_d = jnp.where(same_side_d[..., None], albedo * INV_PI, 0.0)

    # --- specular reflection (mirror half of MIRROR and GLASS) ---
    wi_r = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    wwi_r = l2w(frame, wi_r)
    # safe_div: abs_cos_r**2 = 1e-40 flushes to 0 in the plain div
    # transpose (FTZ) -> NaN on grazing specular lanes even when their
    # cotangent is zero — one of the two named r4 poison chains
    abs_cos_r = jnp.maximum(jnp.abs(wi_r[..., 2]), 1e-20)[..., None]
    f_mirror = safemath.safe_div(
        fresnel_conductor(cos_wo, eta3, k3) * albedo, abs_cos_r
    )
    ior = eta3[..., 0]
    fr_glass = fresnel_dielectric_eval(cos_wo, jnp.ones_like(ior), ior)
    f_glass_r = safemath.safe_div(fr_glass * albedo, abs_cos_r)

    # --- specular transmission ---
    def transmission(et_ctor, ei_ctor):
        # specular_transmission::sampleF (inc/material.h:137-150);
        # Fr has eta_i = et_ctor, eta_t = ei_ctor. Zero indices (rows of
        # other material types, masked downstream) are replaced by 1 to keep
        # the masked lanes' primals/gradients finite.
        et_ctor = jnp.where(et_ctor == 0.0, 1.0, et_ctor)
        ei_ctor = jnp.where(ei_ctor == 0.0, 1.0, ei_ctor)
        entering = cos_wo > 0.0
        ei = jnp.where(entering, et_ctor, ei_ctor)
        et = jnp.where(entering, ei_ctor, et_ctor)
        sin2_i = jnp.maximum(0.0, 1.0 - cos_wo * cos_wo)
        eta = ei / et
        sin2_t = eta * eta * sin2_i
        tir = sin2_t >= 1.0
        cos_t = safe_sqrt(1.0 - sin2_t)
        cos_t = jnp.where(entering, -cos_t, cos_t)
        wi = jnp.stack([eta * -wo[..., 0], eta * -wo[..., 1], cos_t], -1)
        fr = fresnel_dielectric_eval(cos_wo, et_ctor, ei_ctor)
        scale = (et * et) / (ei * ei)
        f = safemath.safe_div(
            scale[..., None] * (1.0 - fr) * albedo,
            jnp.maximum(jnp.abs(cos_t), 1e-20)[..., None],
        )
        f = jnp.where(tir[..., None], 0.0, f)
        ok = ~tir
        return f, wi, ok

    # REFRACT: ctor (color, eta_t, eta_i) from scene mat_eta (eta_t, eta_i)
    f_t_refract, wi_t_refract, ok_refract = transmission(
        eta3[..., 0], eta3[..., 1]
    )
    # GLASS transmission: ctor (color, 1, ior)
    f_t_glass, wi_t_glass, ok_glass = transmission(jnp.ones_like(ior), ior)

    wwi_t_refract = l2w(frame, wi_t_refract)
    wwi_t_glass = l2w(frame, wi_t_glass)

    # --- combine by material type ---
    is_diffuse = mtype == MAT_DIFFUSE
    is_mirror = mtype == MAT_MIRROR
    is_refract = mtype == MAT_REFRACT
    is_glass = mtype == MAT_GLASS

    if non_specular_only:
        # types = all & ~specular: only lambert matches; everything else has
        # zero matching components -> pdf 0, f 0 (material.cpp:19-23)
        f = jnp.where(is_diffuse[..., None], f_d, 0.0)
        wwi = jnp.where(is_diffuse[..., None], wwi_d, wwo)
        pdf = jnp.where(is_diffuse, pdf_d, 0.0)
        is_spec = jnp.zeros_like(is_diffuse)
        return BsdfSample(f=f, wwi=wwi, pdf=pdf, is_specular=is_spec)

    # glass: uniform choice among its 2 components, pdf /= 2
    pick_refl = u_select < 0.5
    f_glass = jnp.where(pick_refl[..., None], f_glass_r, f_t_glass)
    wwi_glass = jnp.where(pick_refl[..., None], wwi_r, wwi_t_glass)
    ok_glass_sel = jnp.where(pick_refl, True, ok_glass)
    pdf_glass = jnp.where(ok_glass_sel, 0.5, 0.0)

    f = jnp.where(
        is_diffuse[..., None],
        f_d,
        jnp.where(
            is_mirror[..., None],
            f_mirror,
            jnp.where(
                is_refract[..., None],
                f_t_refract,
                jnp.where(is_glass[..., None], f_glass, 0.0),
            ),
        ),
    )
    wwi = jnp.where(
        is_diffuse[..., None],
        wwi_d,
        jnp.where(
            is_mirror[..., None],
            wwi_r,
            jnp.where(
                is_refract[..., None],
                wwi_t_refract,
                jnp.where(is_glass[..., None], wwi_glass, wwo),
            ),
        ),
    )
    pdf = jnp.where(
        is_diffuse,
        pdf_d,
        jnp.where(
            is_mirror,
            1.0,
            jnp.where(
                is_refract,
                jnp.where(ok_refract, 1.0, 0.0),
                jnp.where(is_glass, pdf_glass, 0.0),
            ),
        ),
    )
    is_spec = is_mirror | is_refract | is_glass
    return BsdfSample(f=f, wwi=wwi, pdf=pdf, is_specular=is_spec)

"""Path-tracing integrator: next-event estimation + MIS, fixed-depth scan.

Faithful to renderer::ray_color / estimate_direct_light /
uniform_sample_one_light (src/renderer.cpp:5-96):

- shading vertices at bounces 0..7 (break when `bounces > 6` fires after the
  8th vertex's throughput update), no Russian roulette;
- emitted radiance added only at the first vertex or after a specular bounce;
- one uniformly-chosen light per vertex, estimator scaled by light count;
- light-strategy MIS weight uses the (reference-swapped) power heuristic
  bsdf^2/(bsdf^2+light^2) — RenderOptions.swapped_light_mis_weight;
- the BSDF-strategy's emitted radiance is gated on the *shading* normal
  (RenderOptions.shading_normal_le_gate);
- escaped rays contribute nothing: every reference light type inherits
  light::Le(ray) == 0 (inc/light.h:10), so the `spec_bounce` escape sum
  (renderer.cpp:86-90) is identically zero and is omitted here;
- point lights are occluded by ANY hit along the shadow ray, even beyond
  the light itself (renderer.cpp:16-17 traces to t_max) — replicated.

The bounce loop is `lax.scan` over megabatches with an alive mask; discrete
material/light choices are masked selects. RNG is counter-based: the caller
provides one key per batch, folded with the bounce index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from plutracer_tpu.ops import bsdf as bsdf_ops
from plutracer_tpu.ops import intersect, lights
from plutracer_tpu.semantics import DEFAULT_OPTIONS, RenderOptions


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _safe_div(a, b, eps=0.0):
    return a / jnp.where(b == 0.0, 1.0, b)


def estimate_direct(scene, hit, frame, mtype, albedo, wwo, li, u, options):
    """estimate_direct_light (src/renderer.cpp:5-51) for one sampled light
    per ray. `u`: (B, 8) uniforms: [light u2 (2), box face (1), box axis (1),
    bsdf select (1), bsdf u2 (2), unused (1)]."""
    p = hit.p
    n = hit.norm
    eta3 = scene.mat_eta[scene.prim_material[hit.prim]]
    k3 = scene.mat_k[scene.prim_material[hit.prim]]

    # ---- light-sampling strategy ----
    ls = lights.sample_light(
        scene, li, p, u[:, 0:2], u[:, 2], u[:, 3], options
    )
    f = bsdf_ops.bsdf_F_nee(mtype, albedo, n, wwo, ls.wi)
    found2, prim2, _ = intersect.query_lite(scene, p, ls.wi, options)
    # unoccluded: no hit at all, or (area light) nearest hit IS the light
    hits_light = found2 & (scene.prim_light[prim2] == li)
    unoccl = ~found2 | (~ls.is_delta & hits_light)

    b_pdf = bsdf_ops.bsdf_pdf_nee(frame, mtype, wwo, ls.wi)
    if options.swapped_light_mis_weight:
        w = _safe_div(b_pdf * b_pdf, b_pdf * b_pdf + ls.pdf * ls.pdf)
    else:
        w = _safe_div(ls.pdf * ls.pdf, b_pdf * b_pdf + ls.pdf * ls.pdf)
    w = jnp.where(ls.is_delta, 1.0, w)
    gate_l = (
        (ls.pdf > 0.0)
        & (_dot(ls.Li, ls.Li) > 0.0)
        & (_dot(f, f) > 0.0)
        & unoccl
    )
    contrib_l = (
        f
        * ls.Li
        * (jnp.abs(_dot(ls.wi, n)) * w * _safe_div(jnp.ones_like(ls.pdf), ls.pdf))[
            ..., None
        ]
    )
    contrib_l = jnp.where(gate_l[..., None], contrib_l, 0.0)

    # ---- BSDF-sampling strategy (non-delta lights only) ----
    bs = bsdf_ops.bsdf_sample(
        frame,
        mtype,
        albedo,
        eta3,
        k3,
        wwo,
        u[:, 4],
        u[:, 5:7],
        non_specular_only=True,
    )
    l_pdf2 = lights.light_pdf(scene, li, p, bs.wwi, options)
    w2 = _safe_div(bs.pdf * bs.pdf, bs.pdf * bs.pdf + l_pdf2 * l_pdf2)
    w2 = jnp.where(bs.is_specular, 1.0, w2)
    if options.shading_normal_le_gate:
        # reference passes the SHADING point's (p, n) into material::Le
        # (renderer.cpp:42): emission gated on dot(n_shading, -wi) > 0;
        # the hit's own normal is not needed, so use the lite query
        found3, prim3, t3 = intersect.query_lite(scene, p, bs.wwi, options)
        le_gate = _dot(n, -bs.wwi) > 0.0
    else:
        hit3 = intersect.query_closest(scene, p, bs.wwi, options)
        found3, prim3 = hit3.found, hit3.prim
        le_gate = _dot(hit3.norm, -bs.wwi) > 0.0
    same_light = found3 & (scene.prim_light[prim3] == li)
    Li2 = jnp.where(
        (same_light & le_gate)[..., None],
        scene.light_intensity[jnp.maximum(li, 0)],
        0.0,
    )
    gate_b = (
        ~ls.is_delta
        & (_dot(bs.f, bs.f) > 0.0)
        & (bs.pdf > 0.0)
        & (bs.is_specular | (l_pdf2 != 0.0))  # early return when light_pdf==0
        & found3
        & (_dot(Li2, Li2) > 0.0)
    )
    contrib_b = (
        bs.f
        * Li2
        * (jnp.abs(_dot(bs.wwi, n)) * w2 * _safe_div(jnp.ones_like(bs.pdf), bs.pdf))[
            ..., None
        ]
    )
    contrib_b = jnp.where(gate_b[..., None], contrib_b, 0.0)

    return contrib_l + contrib_b


def ray_color(
    scene,
    o,
    d,
    key,
    options: RenderOptions = DEFAULT_OPTIONS,
):
    """Radiance for a batch of primary rays. o, d: (B,3). Returns (B,3)."""
    B = o.shape[0]
    num_lights = scene.light_type.shape[0]

    def body(carry, i):
        o, d, T, L, prev_spec, alive, = carry
        k = jax.random.fold_in(key, i)
        u = jax.random.uniform(k, (B, 12))

        hit = intersect.query_closest(scene, o, d, options)
        cur = alive & hit.found
        wwo = -d
        mat = scene.prim_material[hit.prim]
        mtype = scene.mat_type[mat]
        from plutracer_tpu.ops.texture import eval_color

        albedo = eval_color(scene, mat, hit.uv)
        frame = bsdf_ops.make_frame(hit.norm, hit.dpdu)

        # emitted light at the vertex (first or post-specular only)
        emit_gate = (i == 0) | prev_spec
        Le = lights.emitted(scene, hit.prim, hit.norm, wwo)
        L = L + jnp.where(
            (cur & emit_gate)[..., None], T * Le, 0.0
        )

        # next-event estimation: pick one light uniformly
        li = jnp.minimum(
            jnp.floor(u[:, 0] * num_lights).astype(jnp.int32), num_lights - 1
        )
        Ld = estimate_direct(
            scene, hit, frame, mtype, albedo, wwo, li, u[:, 1:9], options
        )
        L = L + jnp.where(cur[..., None], T * Ld * num_lights, 0.0)

        # sample BSDF for the next direction
        bs = bsdf_ops.bsdf_sample(
            frame,
            mtype,
            albedo,
            scene.mat_eta[mat],
            scene.mat_k[mat],
            wwo,
            u[:, 9],
            u[:, 10:12],
        )
        ok = (_dot(bs.f, bs.f) > 0.0) & (bs.pdf > 0.0)
        alive_next = cur & ok & (i <= options.max_bounces - 2)
        T_next = T * bs.f * (jnp.abs(_dot(bs.wwi, hit.norm)) * _safe_div(
            jnp.ones_like(bs.pdf), bs.pdf
        ))[..., None]
        T = jnp.where(alive_next[..., None], T_next, T)
        return (hit.p, bs.wwi, T, L, bs.is_specular, alive_next), None

    # derive carry inits from the (possibly shard_map-varying) ray inputs so
    # the scan carry has consistent varying-manual-axis types under shard_map
    zeros3 = jnp.zeros_like(o)
    init = (
        o,
        d,
        zeros3 + 1.0,
        zeros3,
        jnp.zeros_like(o[..., 0], dtype=bool),
        jnp.zeros_like(o[..., 0], dtype=bool) | True,
    )
    (o_, d_, T, L, spec, alive), _ = jax.lax.scan(
        body, init, jnp.arange(options.max_bounces)
    )
    return L

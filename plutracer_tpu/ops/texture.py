"""Color properties and texture evaluation.

Reference: props::color (inc/props.h:9-31) evaluated at hr.texture_coords;
procedural textures inc/textures/textures.h:7-31; image texel lookup
inc/texture.h:53-60 (wrap-mode nearest neighbor).
"""

from __future__ import annotations

import jax.numpy as jnp

from plutracer_tpu.scene.types import TEX_CHECKERBOARD, TEX_GRID, TEX_IMAGE


def _checkerboard(uv, c0, c1, scale):
    uvf = jnp.floor(uv * scale[..., None])
    idx = jnp.mod(uvf[..., 0] + uvf[..., 1], 2.0)
    return jnp.where(idx[..., None] < 1.0, c0, c1)


def _grid(uv, fg, bg, scale, line):
    # glm step(edge=fract(uv*scale), x=line): 1 where line >= fract
    f = uv * scale[..., None]
    fr = f - jnp.floor(f)
    g = jnp.where(line[..., None] >= fr, 1.0, 0.0)
    m = jnp.maximum(g[..., 0], g[..., 1])
    return bg + (fg - bg) * m[..., None]


def _image(scene, tex, uv):
    c = jnp.mod(uv, 1.0)
    w = scene.tex_img_w[tex]
    h = scene.tex_img_h[tex]
    ic_x = jnp.minimum(jnp.floor(c[..., 0] * w).astype(jnp.int32), w - 1)
    ic_y = jnp.minimum(jnp.floor(c[..., 1] * h).astype(jnp.int32), h - 1)
    flat = scene.tex_img_ofs[tex] + ic_y * w + ic_x
    return scene.atlas[flat]


def eval_color(scene, mat_idx, uv):
    """Evaluate a material's color property: constant or texture.

    mat_idx: (B,) material rows; uv: (B,2). Returns (B,3).
    """
    tex = scene.mat_tex[mat_idx]
    const = scene.mat_color[mat_idx]
    has_tex = tex >= 0
    safe_tex = jnp.maximum(tex, 0)
    ttype = scene.tex_type[safe_tex]
    checker = _checkerboard(
        uv, scene.tex_c0[safe_tex], scene.tex_c1[safe_tex], scene.tex_scale[safe_tex]
    )
    grid = _grid(
        uv,
        scene.tex_c0[safe_tex],
        scene.tex_c1[safe_tex],
        scene.tex_scale[safe_tex],
        scene.tex_line[safe_tex],
    )
    img = _image(scene, safe_tex, uv)
    texval = jnp.where(
        (ttype == TEX_CHECKERBOARD)[..., None],
        checker,
        jnp.where((ttype == TEX_GRID)[..., None], grid, img),
    )
    return jnp.where(has_tex[..., None], texval, const)

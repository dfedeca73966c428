"""Batched texture evaluation (texture.scm), integer-id dispatched.

`value(scene, tex_id, u, v, p)` evaluates one texture id per ray with
masked math over the texture types actually present in the scene (the
compile-time `has_*_tex` flags gate whole branches so Cornell-style
constant-only scenes pay nothing for Perlin).

Checker children are constant textures (the only case in the reference,
main.scm:206-209), so the nested `value` call collapses to a table lookup.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene import build as sb
from ..scene import perlin


def value(scene, tex_id, u, v, p):
    """Evaluate textures: tex_id [N] i32, u/v [N], p [N,3] -> color [N,3]."""
    ttype = scene.tex_type[tex_id]                       # [N]
    out = scene.tex_color[tex_id]                        # constant (texture.scm:12-14)

    if scene.has_checker_tex:
        # texture.scm:16-23 — sign of sin(10x)sin(10y)sin(10z)
        sines = (jnp.sin(10.0 * p[..., 0]) * jnp.sin(10.0 * p[..., 1])
                 * jnp.sin(10.0 * p[..., 2]))
        child = jnp.where(sines < 0.0, scene.tex_child1[tex_id],
                          scene.tex_child0[tex_id])
        out = jnp.where((ttype == sb.TEX_CHECKER)[..., None],
                        scene.tex_color[child], out)

    if scene.has_perlin_tex:
        scale = scene.tex_scale[tex_id]
        # texture.scm:25-28 — raw noise (range ~[-1,1], reproduced as-is)
        gray_noise = perlin.noise(scene.perlin_seed, p * scale[..., None])
        # texture.scm:30-34 — marble: 0.5*(1+sin(sc*z + 10*turb(p)))
        gray_marble = 0.5 * (1.0 + jnp.sin(
            scale * p[..., 2]
            + 10.0 * perlin.turb(scene.perlin_seed, p)))
        out = jnp.where((ttype == sb.TEX_NOISE)[..., None],
                        gray_noise[..., None], out)
        out = jnp.where((ttype == sb.TEX_MARBLE)[..., None],
                        gray_marble[..., None], out)

    if scene.has_image_tex:
        # texture.scm:36-50 — clamped nearest lookup, v flipped
        nx = scene.tex_iw[tex_id].astype(p.dtype)
        ny = scene.tex_ih[tex_id].astype(p.dtype)
        i = jnp.clip(u * nx, 0.0, nx - 1.0).astype(jnp.int32)
        j = jnp.clip((1.0 - v) * ny - 0.001, 0.0, ny - 1.0).astype(jnp.int32)
        img = scene.tex_image[tex_id]
        texel = scene.images[img, j, i]                  # [N,3]
        out = jnp.where((ttype == sb.TEX_IMAGE)[..., None], texel, out)

    return out

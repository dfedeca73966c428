"""Scene-level closest-hit query: masked sweeps over every primitive group.

This replaces the reference's `hit-obj-list` linear closure walk
(geometry.scm:33-50) with per-group batched intersectors combined by a
running min — the whole query is one fused XLA computation per bounce.
Constant media are resolved *after* the solid groups so their scatter
interval is clipped to the closest solid hit, reproducing the reference's
closest-so-far clamping (geometry.scm:556-557) for non-overlapping media.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import sphere, rect, medium, bezier, klein


class HitRec(NamedTuple):
    """SoA hit record (ray.scm:27-54): [t, p, normal, material, u, v] + mask."""
    hit: jnp.ndarray      # [N] bool
    t: jnp.ndarray        # [N]
    p: jnp.ndarray        # [N,3]
    normal: jnp.ndarray   # [N,3]
    mat: jnp.ndarray      # [N] i32
    u: jnp.ndarray        # [N]
    v: jnp.ndarray        # [N]


def _merge(best, cand):
    """Keep the closer of two group results (hit, t, n, mat, u, v)."""
    bh, bt, bn, bm, bu, bv = best
    ch, ct, cn, cm, cu, cv = cand
    closer = ch & (~bh | (ct < bt))
    c3 = closer[:, None]
    return (bh | ch, jnp.where(closer, ct, bt), jnp.where(c3, cn, bn),
            jnp.where(closer, cm, bm), jnp.where(closer, cu, bu),
            jnp.where(closer, cv, bv))


def scene_hit(o, d, time, scene, t_min, t_max, xi_medium, config) -> HitRec:
    """Closest hit over all groups; o/d [N,3], d unit; t_max scalar.

    xi_medium: [N, n_media] uniforms for exponential scatter distances
    (None allowed when the scene has no constant media).
    """
    n = o.shape[0]
    dt = o.dtype
    best = (jnp.zeros(n, bool), jnp.full(n, t_max, dt), jnp.zeros((n, 3), dt),
            jnp.zeros(n, jnp.int32), jnp.zeros(n, dt), jnp.zeros(n, dt))

    # Flat threaded BVH (geometry.scm:217-374) when compiled into the
    # scene and selected; one tree spans BOTH analytic groups (global ids,
    # like the reference's BVH of arbitrary hittables).  The stackless
    # while_loop traversal is forward-only, so the differentiable path
    # keeps the brute sweeps.
    use_bvh = (config.traversal == "bvh" and scene.has_bvh
               and not config.differentiable)
    if use_bvh and (scene.has_spheres or scene.has_rects):
        from ..ops import traverse
        best = _merge(best, traverse.intersect_bvh_mixed(
            o, d, time, scene, t_min, t_max))
    else:
        if scene.has_spheres:
            best = _merge(best, sphere.intersect(o, d, time, scene,
                                                 t_min, t_max))
        if scene.has_rects:
            best = _merge(best, rect.intersect(o, d, time, scene,
                                               t_min, t_max))
    if scene.has_beziers:
        best = _merge(best, bezier.intersect(
            o, d, time, scene, t_min, t_max,
            n_seeds=config.bezier_seeds, n_newton=config.bezier_newton))
    if scene.has_klein:
        best = _merge(best, klein.intersect(o, d, time, scene, t_min, t_max))
    if scene.has_media:
        # t clipped to the closest solid hit (or t_max on miss).
        hit0, t0 = best[0], best[1]
        t_clip = jnp.where(hit0, t0, t_max)
        best = _merge(best, medium.intersect(o, d, time, scene, t_min,
                                             t_clip, xi_medium))

    hit, t, normal, mat, u, v = best
    # Sanitize miss lanes: downstream shading runs masked over the whole
    # batch, and garbage here turns into NaN gradients even though the lanes
    # are selected away (zero-cotangent * inf/NaN = NaN in reverse-mode).
    #   p = o (not o + t_max*d ~ 1e12, which overflows f32 light-PDF math);
    #   normal = +y (not the zero vector, which NaNs onb.from_w and poisons
    #   shared scalars like the light-rect area through masked VJPs).
    p = jnp.where(hit[:, None], o + t[:, None] * d, o)
    normal = jnp.where(hit[:, None], normal,
                       jnp.array([0.0, 1.0, 0.0], normal.dtype))
    return HitRec(hit, t, p, normal, mat, u, v)

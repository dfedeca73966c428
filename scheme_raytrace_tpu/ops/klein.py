"""Kleinian limit-set fractal: distance-estimated sphere inversions
(geometry.scm:580-664), sphere-traced with fixed-trip-count loops.

The reference's dist-func rescans its 6 inversion spheres from index 0
after every inversion (geometry.scm:602-624); the sphere interiors are
disjoint (pairwise tangent at distance 2r), so "first containing sphere"
is "the unique containing sphere" and the scan vectorizes to a masked
select.  Marching (geometry.scm:646-661) and the central-difference normal
(geometry.scm:626-632) are `lax.fori_loop`s — fully differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import config as cfg
from ..core import vecmath as vm

# geometry.scm:591-599
_SPHERE_POS = [[300.0, 300.0, 0.0], [300.0, -300.0, 0.0],
               [-300.0, 300.0, 0.0], [-300.0, -300.0, 0.0],
               [0.0, 0.0, 424.26], [0.0, 0.0, -424.26]]


def dist_func(center, pos):
    """Batched DE (geometry.scm:602-624): <=10 inversions, 0.7*(|p|-125)/|dr|."""
    sph = jnp.asarray(_SPHERE_POS, dtype=pos.dtype)          # [6,3]
    r2 = cfg.KLEIN_SPHERE_R * cfg.KLEIN_SPHERE_R

    def body(_, state):
        p, dr, active = state
        diff = p[..., None, :] - sph                          # [...,6,3]
        d2 = vm.sq_len(diff)
        inside = (d2 < r2) & active[..., None]
        any_in = jnp.any(inside, axis=-1)
        k = jnp.argmax(inside, axis=-1)                       # unique when any
        dk = jnp.take_along_axis(diff, k[..., None, None], axis=-2)[..., 0, :]
        d2k = jnp.maximum(jnp.take_along_axis(d2, k[..., None], axis=-1)[..., 0],
                          jnp.finfo(p.dtype).tiny)
        scale = r2 / d2k                                      # geometry.scm:615
        p_inv = dk * scale[..., None] + sph[k]                # geometry.scm:616-618
        p = jnp.where(any_in[..., None], p_inv, p)
        dr = jnp.where(any_in, dr * scale, dr)
        return p, dr, active & any_in

    p0 = pos - center
    dr0 = jnp.ones(pos.shape[:-1], pos.dtype)
    p, dr, _ = jax.lax.fori_loop(0, cfg.KLEIN_ITERATIONS, body,
                                 (p0, dr0, jnp.ones_like(dr0, bool)))
    return cfg.KLEIN_DE_SCALE * (vm.length(p) - cfg.KLEIN_R) / jnp.abs(dr)


def get_normal(center, p):
    """Exact DE gradient (3 forward tangents through dist_func).

    The reference uses central differences with h=0.01
    (geometry.scm:626-632); this framework uses the exact gradient in
    BOTH render paths (here and the fused kernel's hand-derived
    _klein_dist_grad) so they stay equivalent — a documented deviation
    like the B-ledger bug fixes, applied to the f64 oracle as well
    (parity goldens rendered with it)."""
    comps = [jax.jvp(lambda q: dist_func(center, q), (p,),
                     (jnp.broadcast_to(jnp.eye(3, dtype=p.dtype)[ax],
                                       p.shape),))[1]
             for ax in range(3)]
    return vm.unit(jnp.stack(comps, axis=-1))


def _march_one(o, d, center, t_min, t_max):
    """Sphere trace one klein instance (geometry.scm:646-661)."""
    def body(_, state):
        ray_len, done, hit = state
        pos = o + d * ray_len[..., None]
        dist = dist_func(center, pos)
        new_len = ray_len + dist
        accept = (dist < cfg.KLEIN_SURF_EPS) & (new_len > t_min) & (new_len < t_max)
        ray_len = jnp.where(done, ray_len, new_len)
        hit = hit | (accept & ~done)
        done = done | accept
        return ray_len, done, hit

    # Reference marches from ray_length=0, evaluating at the *pre-advance*
    # position each step and accepting on the post-advance length.
    zero = jnp.zeros(o.shape[:-1], o.dtype)
    ray_len, _, hit = jax.lax.fori_loop(
        0, cfg.KLEIN_MAX_STEPS, body, (zero, zero.astype(bool), zero.astype(bool)))
    return hit, jnp.where(hit, ray_len, jnp.inf)


def intersect(o, d, time, scene, t_min, t_max):
    """Closest klein hit per ray; usually 1 instance per scene.

    The march runs under stop_gradient and the differentiable hit t is
    attached afterwards by the implicit-function correction
    t -= (DE(o + t d) - eps)/dDE/dt at the converged root — the SAME
    convention as the fused kernel's klein_probe (integrator/bounce.py).
    Differentiating THROUGH the 100-step march tape (the pre-round-5
    design) is both slower and NaN-prone: march/tape positions of rays
    that pass near an inversion-sphere center (e.g. (550,500,280) sits
    inside the Cornell box) overflow the squared reverse-mode tangents
    to inf, and inf - inf poisons every gradient leaf through the masked
    selects even though those lanes lose the closest-hit merge.  The
    gradient probe is likewise evaluated at a benign point for miss
    lanes, whose positions are arbitrary (t_max) and carry no signal.
    Forward values are bit-identical to the tape design (the correction
    term is zero in the primal)."""
    sg = jax.lax.stop_gradient

    def one(center, valid, mat):
        h, t = _march_one(sg(o), sg(d), sg(center), t_min, t_max)
        return h & valid, t, mat

    best_t = jnp.full(o.shape[:-1], jnp.inf, o.dtype)
    best_mat = jnp.zeros(o.shape[:-1], jnp.int32)
    best_c = jnp.zeros_like(o)
    n = scene.kl_center.shape[0]
    for i in range(n):  # static unroll; scenes have at most 1 klein
        h, t, mat = one(scene.kl_center[i], scene.kl_valid[i], scene.kl_mat[i])
        closer = h & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        best_mat = jnp.where(closer, mat, best_mat)
        best_c = vm.where3(closer, jnp.broadcast_to(scene.kl_center[i], o.shape),
                           best_c)
    hit = jnp.isfinite(best_t)
    t_raw = sg(jnp.where(hit, best_t, t_max))
    p_raw = o + t_raw[..., None] * d               # differentiable in o, d
    safe = jnp.asarray([200.0, 0.0, 0.0], o.dtype)  # outside every
    p_eval = jnp.where(hit[..., None], p_raw, sg(best_c) + safe)  # inv. sphere
    de = dist_func(best_c, p_eval)
    g = jnp.stack([jax.jvp(lambda q: dist_func(best_c, q), (p_eval,),
                           (jnp.broadcast_to(jnp.eye(3, dtype=o.dtype)[ax],
                                             p_eval.shape),))[1]
                   for ax in range(3)], axis=-1)
    ddt = jnp.sum(g * d, axis=-1)
    denom = jnp.where(jnp.abs(ddt) > 1e-6, ddt,
                      jnp.where(ddt >= 0.0, 1e-6, -1e-6))
    corr = jnp.where(hit, (de - cfg.KLEIN_SURF_EPS) / denom, 0.0)
    t = t_raw - (corr - sg(corr))                  # primal == t_raw
    normal = vm.unit(g)
    tb = jnp.where(hit, t, t_max)
    zero = jnp.zeros_like(tb)
    return hit, tb, normal, best_mat, zero, zero

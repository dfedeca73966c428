"""Batched 3-vector algebra on ``[..., 3]`` arrays.

The reference's vec.scm builds one heap-allocated f64vector per operation
(vec.scm:20-50); here a "vec3" is just the trailing axis of a batched jnp
array, so the whole ray pool is one SoA tensor and every op is a fused VPU
sweep.  Covers vec.scm:7-70 (sum/diff/prod/quot/scale/dot/cross/unit/length)
plus material.scm:41-43 (reflect), :59-67 (refract), :69-74 (schlick).
"""

from __future__ import annotations

import jax.numpy as jnp


def vec3(x, y, z, dtype=None):
    """Stack three scalars/batches into a ``[..., 3]`` vector (vec.scm:7)."""
    v = jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)), axis=-1)
    return v.astype(dtype) if dtype is not None else v


def dot(a, b):
    """vec.scm:52 — batched inner product over the trailing axis."""
    return jnp.sum(a * b, axis=-1)


def sq_len(a):
    """vec.scm:56-58."""
    return jnp.sum(a * a, axis=-1)


def length(a):
    """vec.scm:54-55."""
    return jnp.sqrt(sq_len(a))


def unit(a, eps: float = 0.0):
    """vec.scm:60-62 — normalize; optional eps guards 0-length (ref has none)."""
    n = length(a)
    if eps:
        n = jnp.maximum(n, eps)
    return a / n[..., None]


def cross(a, b):
    """vec.scm:64-70."""
    return jnp.cross(a, b)


def reflect(v, n):
    """material.scm:41-43 — mirror reflection v - 2(v.n)n."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(v, n, ni_over_nt):
    """material.scm:59-67 — Snell refraction of *unit-ized* v about n.

    Returns (ok, refracted): ok=False marks total internal reflection, in
    which case `refracted` is zeros (caller must select reflection).
    """
    uv = unit(v)
    dt = dot(uv, n)
    disc = 1.0 - ni_over_nt * ni_over_nt * (1.0 - dt * dt)
    ok = disc > 0.0
    # double-where keeps sqrt' finite on the total-internal-reflection lanes
    safe = jnp.sqrt(jnp.where(ok, disc, 1.0))
    refr = ni_over_nt[..., None] * (uv - n * dt[..., None]) - n * safe[..., None]
    return ok, jnp.where(ok[..., None], refr, 0.0)


def schlick(cosine, ref_idx):
    """material.scm:69-74 — Schlick's Fresnel approximation."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * jnp.power(jnp.maximum(1.0 - cosine, 0.0), 5.0)


def where3(mask, a, b):
    """Select whole vectors with a scalar-per-row mask."""
    return jnp.where(mask[..., None], a, b)

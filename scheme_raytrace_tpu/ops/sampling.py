"""Batched random direction/point samplers (util.scm:9-54).

The reference rejection-samples unit-sphere/disk points (util.scm:9-23);
rejection loops are divergence on TPU, so every sampler here is the exact
analytic (inverse-CDF) equivalent — same distribution, fixed trip count.
`random-cosine-direction`'s Shirley-1st-edition x2 bug (util.scm:42-43,
SURVEY.md B4) is consciously fixed to the standard sqrt(r2) form; parity is
defined statistically against this oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import vecmath as vm

_TWO_PI = 2.0 * jnp.pi


def in_unit_sphere(key, shape, dtype=jnp.float32):
    """Uniform point inside the unit ball (util.scm:9-15, analytic form)."""
    k1, k2, k3 = jax.random.split(key, 3)
    z = jax.random.uniform(k1, shape, dtype, -1.0, 1.0)
    phi = jax.random.uniform(k2, shape, dtype, 0.0, _TWO_PI)
    r = jnp.cbrt(jax.random.uniform(k3, shape, dtype))
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return r[..., None] * vm.vec3(s * jnp.cos(phi), s * jnp.sin(phi), z)


def in_unit_disk(key, shape, dtype=jnp.float32):
    """Uniform point in the unit disk, z=0 (util.scm:17-23, analytic)."""
    k1, k2 = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(k1, shape, dtype))
    phi = jax.random.uniform(k2, shape, dtype, 0.0, _TWO_PI)
    return vm.vec3(r * jnp.cos(phi), r * jnp.sin(phi), jnp.zeros_like(r))


def cosine_direction(key, shape, dtype=jnp.float32):
    """Cosine-weighted hemisphere direction about +z (util.scm:37-44, B4 fixed)."""
    k1, k2 = jax.random.split(key)
    r1 = jax.random.uniform(k1, shape, dtype)
    r2 = jax.random.uniform(k2, shape, dtype)
    phi = _TWO_PI * r1
    sr2 = jnp.sqrt(r2)
    z = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
    return vm.vec3(jnp.cos(phi) * sr2, jnp.sin(phi) * sr2, z)


def hemisphere_direction(key, shape, dtype=jnp.float32):
    """Uniform hemisphere direction about +z (util.scm:25-35, analytic)."""
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, shape, dtype)          # cos(theta) ~ U[0,1]
    phi = jax.random.uniform(k2, shape, dtype, 0.0, _TWO_PI)
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return vm.vec3(s * jnp.cos(phi), s * jnp.sin(phi), z)


def to_sphere(key, radius, distance_sq, shape, dtype=jnp.float32):
    """Solid-angle direction toward a sphere, local frame (util.scm:46-54).

    Used by the hittable-PDF light sampler (pdf.scm's missing g:random, B5).
    radius/distance_sq broadcast against `shape`.
    """
    k1, k2 = jax.random.split(key)
    r1 = jax.random.uniform(k1, shape, dtype)
    r2 = jax.random.uniform(k2, shape, dtype)
    cos_theta_max = jnp.sqrt(jnp.maximum(1.0 - radius * radius / distance_sq, 0.0))
    z = 1.0 + r2 * (cos_theta_max - 1.0)
    phi = _TWO_PI * r1
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return vm.vec3(jnp.cos(phi) * s, jnp.sin(phi) * s, z)

"""Counter-based RNG threading for the wavefront integrator.

The reference consumes srfi-27's global sequential RNG at many sites
(SURVEY.md §6.3 "RNG call sites"); order-dependent sequential state is
hostile to SPMD, so the TPU design derives every random draw from a
(seed, pixel, sample, bounce, site) counter tuple via threefry fold_in —
order-robust, shard-invariant, and reproducible (parity with the reference
is statistical, not bitwise — SURVEY §7.3 item 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stable per-call-site salts (matches the reference's variance-shaping RNG
# sites: pixel jitter, lens disk, ray time, scatter dir, dielectric branch,
# medium distance — SURVEY.md §6.3).
SITE_PIXEL_JITTER = 1
SITE_LENS = 2
SITE_TIME = 3
SITE_SCATTER = 4
SITE_DIELECTRIC = 5
SITE_MEDIUM = 6
SITE_LIGHT = 7
SITE_MIX = 8
SITE_RR = 9


def root_key(seed: int):
    return jax.random.key(seed)


def bounce_key(key, bounce, site: int):
    """Key for one call site within one bounce (vector draws index rays)."""
    return jax.random.fold_in(jax.random.fold_in(key, bounce), site)


def uniform(key, shape, dtype=jnp.float32, lo=0.0, hi=1.0):
    return jax.random.uniform(key, shape, dtype=dtype, minval=lo, maxval=hi)

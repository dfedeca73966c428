"""Perlin noise: seeded table generation (host) + batched evaluation (jnp).

The reference generates its tables at module-load time from the global
srfi-27 RNG (perlin.scm:32-36), making scenes nondeterministic across runs
(SURVEY.md §7.3 item 6).  Here tables are generated from an explicit seed at
scene build and stored as scene arrays, so renders are reproducible and the
tables ride along under jit/sharding like any other scene parameter.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import vecmath as vm

TABLE = 256


def generate_tables(seed: int):
    """Host-side table generation (perlin.scm:10-36), numpy.

    Returns (ranvec [256,3] unit vectors, perm [3,256] int32).
    The reference's +ranfloat+ table (perlin.scm:32) is generated but never
    read by noise/turb — we drop it (dead-code ledger, SURVEY §6.6).
    """
    rng = np.random.default_rng(seed)
    v = rng.uniform(-1.0, 1.0, size=(TABLE, 3))
    ranvec = v / np.linalg.norm(v, axis=-1, keepdims=True)
    perms = np.stack([rng.permutation(TABLE) for _ in range(3)])
    return ranvec.astype(np.float64), perms.astype(np.int32)


def noise(ranvec, perm, p):
    """Batched gradient noise (perlin.scm:51-90) for points p [...,3].

    Lattice hash ranvec[perm_x[(i+di)&255] ^ perm_y[...] ^ perm_z[...]] with
    Hermite-smoothed gradient interpolation; output range ~[-1, 1].
    """
    pf = jnp.floor(p)
    ijk = pf.astype(jnp.int32)
    uvw = p - pf
    # Hermite fade (perlin.scm:52-54)
    f = uvw * uvw * (3.0 - 2.0 * uvw)
    acc = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                hx = perm[0, (ijk[..., 0] + di) & 255]
                hy = perm[1, (ijk[..., 1] + dj) & 255]
                hz = perm[2, (ijk[..., 2] + dk) & 255]
                g = ranvec[hx ^ hy ^ hz]  # [...,3]
                d = uvw - jnp.asarray([di, dj, dk], dtype=p.dtype)
                w = ((di * f[..., 0] + (1 - di) * (1.0 - f[..., 0]))
                     * (dj * f[..., 1] + (1 - dj) * (1.0 - f[..., 1]))
                     * (dk * f[..., 2] + (1 - dk) * (1.0 - f[..., 2])))
                acc = acc + w * vm.dot(d, g)
    return acc


def turb(ranvec, perm, p, depth: int = 7):
    """7-octave |fBm| (perlin.scm:92-103)."""
    acc = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    weight = 1.0
    q = p
    for _ in range(depth):
        acc = acc + weight * noise(ranvec, perm, q)
        q = q * 2.0
        weight = weight * 0.5
    return jnp.abs(acc)

"""Orthonormal basis from a normal (onb.scm:8-36), batched.

Reference picks the cross-product pivot by |w.x| > 0.9 (onb.scm:10-13);
reproduced exactly but as a masked select over the whole batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import vecmath as vm


def from_w(w):
    """Build (u, v, w) frames from unit normals w: [...,3] -> 3x [...,3].

    onb.scm:8-16: a = |w.x|>0.9 ? (0,1,0) : (1,0,0); v = unit(w x a); u = w x v.
    The reference's u = w x v yields a LEFT-handed frame; we use u = v x w
    (right-handed). Every consumer — cosine sampling, sphere solid-angle
    sampling (both azimuthally symmetric around w), and the bezier ray-space
    frame (ops/bezier.py, which only uses cx^2+cy^2 — handedness-invariant) —
    is unaffected, so the distributions are identical; documented conscious fix.
    """
    w = vm.unit(w, eps=1e-12)       # eps: masked lanes may pass junk vectors
    pick_y = jnp.abs(w[..., 0]) > 0.9
    a = jnp.where(pick_y[..., None],
                  jnp.array([0.0, 1.0, 0.0], dtype=w.dtype),
                  jnp.array([1.0, 0.0, 0.0], dtype=w.dtype))
    v = vm.unit(vm.cross(w, a), eps=1e-12)
    u = vm.cross(v, w)
    return u, v, w


def local(u, v, w, a):
    """Frame-to-world for local coords a=[...,3] (onb.scm:27-36)."""
    return (a[..., 0:1] * u + a[..., 1:2] * v + a[..., 2:3] * w)

"""Batched ray x axis-aligned-rect sweep (geometry.scm:376-431) with
per-primitive rigid instancing (translate geometry.scm:465-481, rotate-y
geometry.scm:483-543).

The reference wraps objects in ray-transforming closures; here every rect
carries an object->world rotation+translation baked at scene compile, and
the sweep transforms each ray into each rect's object space — one fused
[N rays, R rects] computation.  `flip` (+1/-1) folds flip-normals
(geometry.scm:433-442) and the box min-faces (geometry.scm:444-463) into a
sign.
"""

from __future__ import annotations

import jax.numpy as jnp


def intersect(o, d, time, scene, t_min, t_max):
    """Closest valid rect hit per ray; see sphere.intersect for the contract."""
    rot, trans = scene.rect_rot, scene.rect_trans        # [R,3,3], [R,3]
    if scene.has_rect_xform:
        # x_o = R^T (x_w - t);  d_o = R^T d_w
        o_l = jnp.einsum("rji,nrj->nri", rot, o[:, None, :] - trans[None])
        d_l = jnp.einsum("rji,nj->nri", rot, d)
    else:
        o_l = o[:, None, :]
        d_l = d[:, None, :]

    axis = scene.rect_axis                               # [R] normal axis
    # One-hot selectors for the normal axis and the two in-plane axes
    # (ascending index order — matches Rect's (a0,a1)/(b0,b1) convention).
    eye = jnp.eye(3, dtype=o.dtype)
    n_sel = eye[axis]                                    # [R,3]
    ia = jnp.where(axis == 0, 1, 0)                      # first in-plane axis
    ib = jnp.where(axis == 2, 1, 2)                      # second in-plane axis
    a_sel = eye[ia]
    b_sel = eye[ib]

    on = jnp.sum(o_l * n_sel[None], axis=-1)             # [N,R] o along normal
    dn = jnp.sum(d_l * n_sel[None], axis=-1)
    t = (scene.rect_k[None] - on) / dn                   # geometry.scm:378-379
    pa = jnp.sum(o_l * a_sel[None], axis=-1) + t * jnp.sum(d_l * a_sel[None], axis=-1)
    pb = jnp.sum(o_l * b_sel[None], axis=-1) + t * jnp.sum(d_l * b_sel[None], axis=-1)

    inside = ((pa >= scene.rect_a0[None]) & (pa <= scene.rect_a1[None])
              & (pb >= scene.rect_b0[None]) & (pb <= scene.rect_b1[None]))
    ok = (t >= t_min) & (t <= t_max) & inside & scene.rect_valid[None]
    t = jnp.where(ok, t, jnp.inf)

    j = jnp.argmin(t, axis=1)
    tb = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
    hit = jnp.isfinite(tb)
    tb = jnp.where(hit, tb, t_max)

    # world normal = R @ (one-hot(axis) * flip)
    n_obj = n_sel[j] * scene.rect_flip[j][:, None]
    if scene.has_rect_xform:
        normal = jnp.einsum("nij,nj->ni", rot[j], n_obj)
    else:
        normal = n_obj
    ga = lambda x: jnp.take_along_axis(x, j[:, None], axis=1)[:, 0]
    u = (ga(pa) - scene.rect_a0[j]) / (scene.rect_a1[j] - scene.rect_a0[j])
    v = (ga(pb) - scene.rect_b0[j]) / (scene.rect_b1[j] - scene.rect_b0[j])
    return hit, tb, normal, scene.rect_mat[j], u, v

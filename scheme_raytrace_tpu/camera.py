"""Thin-lens + motion-blur camera (camera.scm:63-92), batched & differentiable.

The reference stores a precomputed 10-slot vector camera (camera.scm:63-78);
here the camera is a pytree of the *pose parameters themselves* and the
basis is derived inside the traced function, so gradients flow to
lookfrom/lookat/vup/vfov/aperture/focus_dist (BASELINE: differentiable
w.r.t. camera pose).

Convention change vs the reference (documented per SURVEY.md §2.1): ray
directions ARE normalized at generation.  The reference leaves them
unnormalized (camera.scm:85-92); its two length-sensitive consumers —
dielectric's cosine (material.scm:88-89) and constant-medium distances
(geometry.scm:561,566) — divide by |dir|, which becomes the identity under
this convention, so rendered results are unchanged.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .core import vecmath as vm
from .ops import sampling


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    """Differentiable camera parameters (camera.scm:63-78 argument list)."""

    lookfrom: jnp.ndarray   # [3]
    lookat: jnp.ndarray     # [3]
    vup: jnp.ndarray        # [3]
    vfov: jnp.ndarray       # degrees, vertical axis (camera.scm:65)
    aspect: jnp.ndarray     # width/height
    aperture: jnp.ndarray
    focus_dist: jnp.ndarray
    time0: jnp.ndarray
    time1: jnp.ndarray


def make_camera(lookfrom, lookat, vup=(0.0, 1.0, 0.0), vfov=40.0, aspect=1.0,
                aperture=0.0, focus_dist=10.0, time0=0.0, time1=0.0,
                dtype=jnp.float32) -> Camera:
    f = lambda v: jnp.asarray(v, dtype=dtype)
    return Camera(f(lookfrom), f(lookat), f(vup), f(vfov), f(aspect),
                  f(aperture), f(focus_dist), f(time0), f(time1))


def _basis(cam: Camera):
    """camera.scm:66-78 — derive (origin, lower_left, horizontal, vertical, u, v, w)."""
    theta = cam.vfov * (jnp.pi / 180.0)
    half_h = jnp.tan(theta / 2.0)
    half_w = cam.aspect * half_h
    w = vm.unit(cam.lookfrom - cam.lookat)
    u = vm.unit(vm.cross(cam.vup, w))
    v = vm.cross(w, u)
    origin = cam.lookfrom
    fd = cam.focus_dist
    lower_left = origin - half_w * fd * u - half_h * fd * v - fd * w
    horizontal = 2.0 * half_w * fd * u
    vertical = 2.0 * half_h * fd * v
    return origin, lower_left, horizontal, vertical, u, v, w


def get_rays_u(cam: Camera, s, t, lens_r1, lens_r2, time_xi):
    """Batched camera.scm:80-92 — (s, t) in [0,1]^2, one ray per element.

    (lens_r1, lens_r2) drive the defocus-disk draw, time_xi the shutter
    time — explicit uniforms so the regeneration pool / Pallas paths can
    use counter-hash streams.  Returns (origin[N,3], unit dir[N,3], time[N]).
    """
    origin, lower_left, horizontal, vertical, u, v, _ = _basis(cam)
    lens_radius = cam.aperture / 2.0
    rd = lens_radius * sampling.in_unit_disk_u(lens_r1, lens_r2)
    offset = rd[..., 0:1] * u + rd[..., 1:2] * v
    time = cam.time0 + time_xi * (cam.time1 - cam.time0)
    o = origin + offset
    d = (lower_left + s[..., None] * horizontal + t[..., None] * vertical
         - origin - offset)
    return o, vm.unit(d), time


def get_rays(cam: Camera, s, t, key):
    """Key-based get_rays_u (the per-pass differentiable-path stream)."""
    k_lens, k_time = jax.random.split(key)
    r = jax.random.uniform(k_lens, s.shape + (2,), s.dtype)
    time_xi = jax.random.uniform(k_time, s.shape, s.dtype)
    return get_rays_u(cam, s, t, r[..., 0], r[..., 1], time_xi)

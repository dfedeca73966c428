"""Importance-sampling PDFs (pdf.scm + the machinery it left unfinished).

pdf.scm defines cosine/hitable/mixture PDFs but `make-hitable-pdf` calls
`g:pdf-value`/`g:random` that exist nowhere (pdf.scm:28-32, bug B5) and no
module imports pdf.scm at all — the light-sampling configs in BASELINE
require the missing hittable pdf_value/sample, supplied here with the
standard RTROYL formulas for xz-rects and spheres (the sphere sampler uses
util.scm:46-54 `random-to-sphere`, dead code in the reference).

Multiple lights follow the canonical hittable-list PDF: `value` averages
over lights, `sample` picks one uniformly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from ..ops import onb, sampling
from ..scene import build as sb

_PI = jnp.pi


def cosine_value(n, direction):
    """pdf.scm:18-26 — max(cos, 0)/pi about normal n."""
    cosine = vm.dot(vm.unit(direction), n)
    return jnp.maximum(cosine, 0.0) / _PI


def cosine_sample(key, n):
    """pdf.scm:24-26 — cosine-weighted direction about n (B4 fixed)."""
    u, v, w = onb.from_w(n)
    local_dir = sampling.cosine_direction(key, n.shape[:-1], n.dtype)
    return vm.unit(onb.local(u, v, w, local_dir))


def _rect_value_one(rect, origin, direction):
    """Hittable-PDF value of one xz-rect light (RTROYL §12.1 for B5).

    rect = (x0, x1, z0, z1, k).  pdf = t^2 / (|cos| * area) where the ray
    from `origin` along unit `direction` hits the rect plane inside bounds.
    """
    x0, x1, z0, z1, k = (rect[i] for i in range(5))
    dy = direction[..., 1]
    t = (k - origin[..., 1]) / dy
    px = origin[..., 0] + t * direction[..., 0]
    pz = origin[..., 2] + t * direction[..., 2]
    inside = (t > 1e-3) & (px >= x0) & (px <= x1) & (pz >= z0) & (pz <= z1)
    area = (x1 - x0) * (z1 - z0)
    dist_sq = t * t                      # |direction| == 1
    cosine = jnp.abs(dy)
    val = dist_sq / jnp.maximum(cosine * area, 1e-12)
    return jnp.where(inside, val, 0.0)


def _sphere_value_one(center, radius, origin, direction):
    """Hittable-PDF value of one sphere light: 1 / solid angle (RTROYL §12.2).

    Nonzero only when `direction` actually points into the sphere's cone.
    """
    oc = center - origin
    dist_sq = vm.sq_len(oc)
    ratio = jnp.clip(radius * radius / jnp.maximum(dist_sq, 1e-12), 0.0, 1.0)
    cos_theta_max = jnp.sqrt(1.0 - ratio)
    solid_angle = 2.0 * _PI * (1.0 - cos_theta_max)
    # direction must intersect the sphere: cos(angle to center) >= cos_theta_max
    cos_dir = vm.dot(vm.unit(direction), vm.unit(oc))
    hitting = (dist_sq > radius * radius) & (cos_dir >= cos_theta_max)
    return jnp.where(hitting, 1.0 / jnp.maximum(solid_angle, 1e-12), 0.0)


def lights_value(scene, origin, direction):
    """Average hittable-PDF value over the scene's lights (hittable-list PDF)."""
    vals = []
    for i in range(scene.n_lights):
        is_rect = scene.light_kind[i] == sb.LIGHT_XZ_RECT
        rv = _rect_value_one(scene.light_rect[i], origin, direction)
        sv = _sphere_value_one(scene.light_center[i], scene.light_radius[i],
                               origin, direction)
        vals.append(jnp.where(is_rect, rv, sv))
    return sum(vals) / scene.n_lights


def lights_sample(key, scene, origin):
    """Sample a direction toward one uniformly-chosen light (unit vector)."""
    k_pick, k_rect, k_sph = jax.random.split(key, 3)
    n = origin.shape[0]
    pick = jax.random.randint(k_pick, (n,), 0, scene.n_lights)

    kind = scene.light_kind[pick]
    rect = scene.light_rect[pick]                       # [N,5]
    # rect sample: uniform point on the rect (RTROYL `random` for xz-rect)
    uv = jax.random.uniform(k_rect, (n, 2), origin.dtype)
    px = rect[:, 0] + uv[:, 0] * (rect[:, 1] - rect[:, 0])
    pz = rect[:, 2] + uv[:, 1] * (rect[:, 3] - rect[:, 2])
    target = jnp.stack([px, rect[:, 4], pz], axis=-1)
    rect_dir = vm.unit(target - origin)

    # sphere sample: random-to-sphere (util.scm:46-54) in an ONB toward center
    center = scene.light_center[pick]
    radius = scene.light_radius[pick]
    oc = center - origin
    dist_sq = jnp.maximum(vm.sq_len(oc), 1e-12)
    u, v, w = onb.from_w(oc)
    local_dir = sampling.to_sphere(k_sph, radius, dist_sq, (n,), origin.dtype)
    sph_dir = vm.unit(onb.local(u, v, w, local_dir))

    return vm.where3(kind == sb.LIGHT_XZ_RECT, rect_dir, sph_dir)


def mixture_sample_and_value(key, scene, n, p):
    """make-mixture-pdf (pdf.scm:34-41): 50/50 cosine-about-n / lights.

    Returns (direction [N,3] unit, pdf_value [N]).
    """
    k_pick, k_cos, k_light = jax.random.split(key, 3)
    use_light = jax.random.uniform(k_pick, (n.shape[0],), n.dtype) < 0.5
    d_cos = cosine_sample(k_cos, n)
    d_light = lights_sample(k_light, scene, p)
    direction = vm.where3(use_light, d_light, d_cos)
    pdf = 0.5 * cosine_value(n, direction) + 0.5 * lights_value(scene, p, direction)
    return direction, pdf

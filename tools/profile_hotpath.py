"""Stage-level timing of the regeneration-pool hot path on the live device.

Each stage runs K times inside ONE jitted fori_loop with a carried data
dependency, so per-call dispatch/tunnel latency amortizes away and the
number is true device time.  Run on TPU:

    python tools/profile_hotpath.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# (sys.path, not PYTHONPATH: the env var breaks the axon TPU plugin discovery)

import jax
import jax.numpy as jnp

from scheme_raytrace_tpu import config as cfg
from scheme_raytrace_tpu import scenes
from scheme_raytrace_tpu.camera import get_rays_u
from scheme_raytrace_tpu.config import RenderConfig
from scheme_raytrace_tpu.core import rng
from scheme_raytrace_tpu.integrator import shade
from scheme_raytrace_tpu.integrator.hit import scene_hit
from scheme_raytrace_tpu.scene import compile_scene

K = 50


def timed_loop(stage, init, n=3):
    """Run `stage` K times inside one jit; return seconds per iteration."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, stage, x)

    out = jax.block_until_ready(run(init))    # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}")
    config = RenderConfig(nx=512, ny=512, spp=16, max_depth=100,
                          light_sampling=True, seed=0)
    m = config.pool_rays
    spec = scenes.cornell_box()
    scene = compile_scene(spec.objects, sky=spec.sky)
    cam = spec.camera(aspect=1.0)
    dtype = jnp.float32

    item = jnp.arange(m, dtype=jnp.int32)

    def camera_rays(item):
        u = rng.hash_uniforms(config.seed, item, rng.CAMERA_DEPTH, 5, dtype)
        pix = item % config.n_pixels
        ys, xs = jnp.divmod(pix, config.nx)
        s = (xs.astype(dtype) + u[:, 0]) / config.nx
        t = (ys.astype(dtype) + u[:, 1]) / config.ny
        return get_rays_u(cam, s, t, u[:, 2], u[:, 3], u[:, 4])

    o, d, t = jax.block_until_ready(jax.jit(camera_rays)(item))
    u0 = jax.block_until_ready(jax.jit(
        lambda it: rng.hash_uniforms(config.seed, it, 0, shade.N_U, dtype)
    )(item))
    rec0 = jax.block_until_ready(jax.jit(
        lambda o, d, t: scene_hit(o, d, t, scene, cfg.SHADOW_EPS, cfg.BIG,
                                  None, config))(o, d, t))
    raw = jnp.zeros((config.n_pixels, 3), dtype)
    pix = item % config.n_pixels
    mask = item % 7 == 0

    # --- stages: each folds the loop counter in so work isn't hoisted -----
    def st_rng(i, c):
        return rng.hash_uniforms(config.seed, item + i, 0, shade.N_U,
                                 dtype)[:, 0] + c * 0.0

    def st_cam(i, c):
        o, d, t = camera_rays(item + i)
        return d[:, 0] + c * 0.0

    def st_hit(i, c):
        o2 = o.at[:, 0].add(c[0] * 1e-30)
        rec = scene_hit(o2, d, t, scene, cfg.SHADOW_EPS, cfg.BIG, None,
                        config)
        return rec.t

    def st_shade(i, c):
        u = u0.at[:, 0].add(c[0] * 1e-30)
        sc = shade.shade(u, scene, config, d, rec0)
        return sc.direction[:, 0]

    def st_scatter(i, c):
        return raw.at[pix].add(
            jnp.where(mask[:, None], c[:, None] + 1.0, 0.0))[:m, 0]

    def st_body(i, c):
        o2 = o.at[:, 0].add(c[0] * 1e-30)
        rec = scene_hit(o2, d, t, scene, cfg.SHADOW_EPS, cfg.BIG, None,
                        config)
        u = rng.hash_uniforms(config.seed, item + i, 0, shade.N_U, dtype)
        sc = shade.shade(u, scene, config, d, rec)
        r = raw.at[pix].add(jnp.where(mask[:, None], sc.mult, 0.0))
        return rec.t + sc.direction[:, 0] + r[:m, 0]

    zeros = jnp.zeros(m, dtype)
    stages = [
        ("rng (12 cols)", st_rng, zeros),
        ("camera regen", st_cam, zeros),
        ("scene_hit", st_hit, zeros),
        ("shade", st_shade, zeros),
        ("fb scatter-add", st_scatter, zeros),
        ("body (hit+shade+scatter)", st_body, zeros),
    ]
    for name, fn, init in stages:
        dt = timed_loop(fn, init)
        print(f"{name:>26}: {dt * 1e3:8.3f} ms  "
              f"({m / dt / 1e6:8.1f} Mrays/s equivalent)", flush=True)


if __name__ == "__main__":
    main()

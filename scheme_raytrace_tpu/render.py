"""Rendering: pixel grid -> ray pool -> accumulation -> display transform.

Replaces the reference's scanline loops + global framebuffers
(main.scm:428-491): a whole sample pass is one jitted program, and the
progressive accumulator is an explicit, persistable `RenderState`
(raw radiance sum + sample count + rng seed) — the checkpoint/resume the
reference's in-memory *raw-data*/*sample-count* never persisted
(SURVEY §5.4).

Pixel estimator parity (SURVEY §6.3): jittered u=(x+xi)/W, v=(y+xi)/H
(main.scm:456-457); display transform min(1, sqrt(mean)) then
floor(255.99*c) (main.scm:461-465, :123-124); PPM rows are written
y-flipped (main.scm:445).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import config as cfg_mod
from .camera import Camera, get_rays
from .core import rng
from .integrator.pool import render_pool_auto
from .integrator.wavefront import trace_rays


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderState:
    """Progressive accumulation state (main.scm:430-431,531 made explicit)."""
    raw_sum: jnp.ndarray       # [ny, nx, 3] running radiance sum (row 0 = bottom)
    sample_count: jnp.ndarray  # scalar i32 — completed passes


def init_state(config: cfg_mod.RenderConfig, dtype=None) -> RenderState:
    dtype = config.jnp_dtype if dtype is None else dtype
    return RenderState(jnp.zeros((config.ny, config.nx, 3), dtype),
                       jnp.zeros((), jnp.int32))


def _pixel_uv(config, key, dtype):
    """Jittered (u, v) for every pixel of one pass (main.scm:456-457)."""
    n = config.n_pixels
    ys, xs = jnp.divmod(jnp.arange(n, dtype=jnp.int32), config.nx)
    xi = jax.random.uniform(key, (n, 2), dtype)
    u = (xs.astype(dtype) + xi[:, 0]) / config.nx
    v = (ys.astype(dtype) + xi[:, 1]) / config.ny
    return u, v


def render_pass(scene, cam: Camera, config: cfg_mod.RenderConfig,
                state: RenderState, pass_idx) -> RenderState:
    """One full-frame sample pass: every pixel gets one jittered ray tree."""
    dtype = state.raw_sum.dtype
    key = jax.random.fold_in(rng.root_key(config.seed), pass_idx)
    k_jit, k_lens, k_trace = jax.random.split(key, 3)

    u, v = _pixel_uv(config, k_jit, dtype)
    o, d, time = get_rays(cam, u, v, k_lens)
    radiance = trace_rays(scene, o, d, time, k_trace, config)
    frame = radiance.reshape(config.ny, config.nx, 3)
    return RenderState(state.raw_sum + frame, state.sample_count + 1)


@functools.partial(jax.jit, static_argnames=("config",))
def render(scene, cam: Camera, config: cfg_mod.RenderConfig,
           state: RenderState) -> RenderState:
    """config.spp sample passes from `state` (jitted).

    Forward renders run the regeneration pool (integrator/pool.py) — lanes
    re-issue work the moment a path dies, so the chip never idles on a
    nearly-drained pass.  The differentiable path keeps the fixed-length
    per-pass scan (reverse-mode needs a static trip count).
    """
    if config.differentiable:
        def body(st, i):
            return render_pass(scene, cam, config, st, st.sample_count), None
        state, _ = jax.lax.scan(body, state, None, length=config.spp)
        return state
    state, _, _ = _render_pool_stats(scene, cam, config, state)
    return state


def _render_pool_stats(scene, cam, config, state: RenderState):
    """Pool render returning (state, segments, iters) — bench/CLI stats."""
    raw, segments, iters = render_pool_auto(
        scene, cam, config,
        state.raw_sum.reshape(config.n_pixels, 3), state.sample_count)
    new_state = RenderState(raw.reshape(config.ny, config.nx, 3),
                            state.sample_count + config.spp)
    return new_state, segments, iters


@functools.partial(jax.jit, static_argnames=("config",))
def render_with_stats(scene, cam: Camera, config: cfg_mod.RenderConfig,
                      state: RenderState):
    """Jitted pool render exposing (state, segments, iters)."""
    return _render_pool_stats(scene, cam, config, state)


def render_image(scene, cam: Camera, config: cfg_mod.RenderConfig,
                 dtype=None):
    """Fresh render: returns (mean radiance [ny,nx,3], final RenderState)."""
    dtype = config.jnp_dtype if dtype is None else dtype
    state = render(scene, cam, config, init_state(config, dtype))
    mean = state.raw_sum / jnp.maximum(state.sample_count, 1).astype(dtype)
    return mean, state


def to_u8(mean) -> np.ndarray:
    """Display transform (main.scm:461-465): clamp(sqrt(mean)) -> u8."""
    mean = np.asarray(mean)
    c = np.minimum(np.sqrt(np.maximum(mean, 0.0)), 1.0)   # gamma 2 + clamp
    return np.floor(cfg_mod.GAMMA_QUANT * c).astype(np.uint8)


def write_ppm(path: str, mean) -> None:
    """ASCII P3, y-flipped rows (main.scm:439-450)."""
    img = to_u8(mean)
    ny, nx, _ = img.shape
    with open(path, "w") as f:
        f.write(f"P3\n{nx} {ny}\n255\n")
        for y in range(ny - 1, -1, -1):                   # main.scm:445
            for x in range(nx):
                r, g, b = img[y, x]
                f.write(f"{r} {g} {b}\n")


def save_state(path: str, state: RenderState, seed: int) -> None:
    """Persist (raw_sum, sample_count, seed) — resumable renders (§5.4)."""
    np.savez(path, raw_sum=np.asarray(state.raw_sum),
             sample_count=np.asarray(state.sample_count), seed=seed)


def load_state(path: str) -> RenderState:
    z = np.load(path)
    return RenderState(jnp.asarray(z["raw_sum"]),
                       jnp.asarray(z["sample_count"]))

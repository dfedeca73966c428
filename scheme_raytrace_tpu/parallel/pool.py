"""Sharded regeneration-pool rendering: the fast forward path over a mesh.

Each device runs its own regeneration pool (integrator/pool.py) over a
contiguous row-block of the frame; the Scene/camera are replicated and the
forward pass needs zero collectives (rays are independent — the DP pattern
of SURVEY §2.4).  Work-item RNG is keyed by GLOBAL (pass, pixel) ids, so
the sharded render is BIT-IDENTICAL to the unsharded one: per pixel the
same sample values arrive in the same pass-major order, and f32 summation
order per pixel is unchanged.

The per-shard pool is itself the live-ray compaction mechanism (terminated
lanes immediately re-issue the shard's next work item), so no
collective-permute rebalance is needed while a shard still has queued
work; shards only idle in the final drain tail, bounded by
pool_rays/shard_work of the frame.  For frames whose COST is spatially
concentrated (a fractal in some rows), `render_pool_balanced` below is
the CP/EP-analogue alternative: interleaved work items flatten per-shard
work by construction at the price of one framebuffer psum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from .. import config as cfg_mod
from ..camera import Camera
from ..integrator.pool import render_pool_auto
from .mesh import RAY_AXIS


def render_pool_balanced(scene, cam: Camera, config: cfg_mod.RenderConfig,
                         mesh, raw0=None, sample_base=0):
    """Load-balanced sharded pool render: interleaved work items +
    framebuffer all-reduce (the SURVEY §5.7 CP/EP analogue, implemented).

    Row-band sharding (render_pool_sharded) needs zero collectives but
    inherits the frame's spatial cost structure: a shard whose rows hold
    the expensive content (e.g. a kleinian fractal's sphere-traced pixels
    vs cheap sky rows) becomes the drain-tail straggler.  Here shard s
    processes global work items k*n_dev + s — every shard samples the
    WHOLE frame in an interleaved comb, so per-shard work is balanced by
    construction for ANY spatial cost distribution — and the per-shard
    partial framebuffers are combined with one psum ([n_pix, 3] over ICI,
    ~3MB at 512^2; this all-reduce is the price of the balance).  The
    union of shard sample sets is the EXACT unsharded sample set (RNG
    keyed by global work item), so the combined image matches the
    unsharded render to f32 summation-order noise.

    Returns (raw [ny,nx,3], segments, iters) with iters = pmax over
    shards — the straggler bound the balancing minimizes.
    """
    from ..integrator import bounce, pool_fused

    n_dev = mesh.shape[RAY_AXIS]
    assert config.n_pixels % n_dev == 0, (
        f"frame pixels {config.n_pixels} must divide over {n_dev} devices "
        "(the work unit is a pixel)")
    assert bounce.supported(scene, config), (
        "balanced mode runs the fused pool; scene not covered")
    dtype = config.jnp_dtype
    if raw0 is None:
        raw0 = jnp.zeros((config.n_pixels, 3), dtype)
    else:
        raw0 = raw0.reshape(config.n_pixels, 3)

    raw, segments, iters = _balanced_jit(
        scene, cam, jnp.asarray(sample_base, jnp.int32),
        config=config, mesh=mesh)
    return ((raw0 + raw).reshape(config.ny, config.nx, 3), segments,
            iters)


@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def _balanced_jit(scene, cam, sample_base, *, config, mesh):
    # module-level jit with static (config, mesh): per-call closures would
    # recompile the sharded graph EVERY call (measured ~1000x slowdown on
    # chip); sample_base rides as a traced operand so progressive chunks
    # share one executable
    from ..integrator import pool_fused

    n_dev = mesh.shape[RAY_AXIS]
    dtype = config.jnp_dtype

    def local(scene, cam, sample_base):
        shard = jax.lax.axis_index(RAY_AXIS)
        zero = jax.lax.pcast(jnp.zeros((config.n_pixels, 3), dtype),
                             (RAY_AXIS,), to='varying')
        raw, segments, iters = pool_fused.render_pool_fused(
            scene, cam, config, zero, sample_base,
            pix0=0, total_pix=config.n_pixels, vary_axes=(RAY_AXIS,),
            item_stride=n_dev, item_offset=shard)
        return (jax.lax.psum(raw, RAY_AXIS),
                jax.lax.psum(segments, RAY_AXIS),
                jax.lax.pmax(iters, RAY_AXIS))

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P(), P()),
                   out_specs=(P(), P(), P()))
    return fn(scene, cam, sample_base)


def render_pool_sharded(scene, cam: Camera, config: cfg_mod.RenderConfig,
                        mesh, raw0=None, sample_base=0):
    """Pool-render the frame with rows sharded over the mesh.

    Returns (raw [ny,nx,3] radiance sums, segments, iters) like
    render.render_with_stats; raw0 optionally resumes an accumulation.
    """
    n_dev = mesh.shape[RAY_AXIS]
    assert config.ny % n_dev == 0, (
        f"ny={config.ny} must divide evenly over {n_dev} devices")
    rows = config.ny // n_dev
    local_pix = rows * config.nx
    dtype = config.jnp_dtype
    if raw0 is None:
        raw0 = jnp.zeros((config.ny * config.nx, 3), dtype)
    else:
        raw0 = raw0.reshape(config.ny * config.nx, 3)

    raw, segments, iters = _sharded_jit(
        scene, cam, raw0, jnp.asarray(sample_base, jnp.int32),
        config=config, mesh=mesh)
    return raw.reshape(config.ny, config.nx, 3), segments, iters


@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def _sharded_jit(scene, cam, raw0, sample_base, *, config, mesh):
    # see _balanced_jit: cached executable, traced sample_base
    n_dev = mesh.shape[RAY_AXIS]
    local_pix = (config.ny // n_dev) * config.nx

    def local(scene, cam, raw_shard, sample_base):
        shard = jax.lax.axis_index(RAY_AXIS)
        raw, segments, iters = render_pool_auto(
            scene, cam, config, raw_shard, sample_base,
            pix0=shard * local_pix, total_pix=config.n_pixels,
            vary_axes=(RAY_AXIS,))
        # segments summed across shards; iters is the drain-limited max
        return (raw, jax.lax.psum(segments, RAY_AXIS),
                jax.lax.pmax(iters, RAY_AXIS))

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(RAY_AXIS), P()),
                   out_specs=(P(RAY_AXIS), P(), P()))
    return fn(scene, cam, raw0, sample_base)

"""Persistent-state Pallas megakernel: the whole bounce LOOP on-chip.

Chip profiling of the fused pool showed the bounce kernel itself is only
~20% of each iteration's wall time; the rest is per-buffer sequencing
overhead at the kernel boundary — the loop carry and the pallas call move
~30 separate lane arrays, and each costs a fixed slice of launch/DMA
scheduling time per iteration (measured ~constant per-iteration cost from
m=8k to m=48k, i.e. overhead-bound, not compute-bound).  This module
attacks exactly that:

  * ONE pallas call runs a whole chunk of bounce iterations (grid=(T,));
    grid steps execute sequentially on the TensorCore and constant-
    index_map output blocks stay resident in VMEM — the pool state never
    leaves the chip between bounces;
  * the ENTIRE pool state is PACKED into a single (16*rows, 128) f32
    buffer (integer fields bitcast to f32), so the kernel boundary moves
    ONE buffer in and ONE out, not 16 each way; terminated-path output is
    one (T, 4*rows, 128) flush buffer (pixel ids bitcast);
  * work assignment is STRIDED (lane L takes items L, L+m, L+2m, ...) so
    re-issue is a per-lane `item += m` fused into the kernel — no
    cross-lane prefix sum.  Work items for one pixel always map to the
    same lane in pass order, so per-pixel accumulation order and the
    work-item-keyed RNG match the FIFO pools: the ESTIMATOR is identical,
    only the drain tail's load balance differs.

The chunk loop (lax.while_loop over T-step calls) drains the queue;
`item >= n_work` marks a finished lane.  Coverage is bounce.supported();
the kernel body IS bounce.step — this module only changes where the loop,
the queue, and the state live.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import bounce

CHUNK_T = 32      # bounce iterations per kernel call
N_STATE = 16      # packed state rows-groups (item, fresh, depth, o3, d3,
                  # time, rad3, tp3)


def _kernel(plan, m, n_work, n_pix, pix0, total_pix,
            pk_ref, sb_ref, st_in, st_out, flush, seg):
    import jax.experimental.pallas as pl

    rows = m // 128
    step_i = pl.program_id(0)

    @pl.when(step_i == 0)
    def _init():
        st_out[:] = st_in[:]

    def rd(i):
        return st_out[i * rows:(i + 1) * rows, :]

    def wr(i, v):
        st_out[i * rows:(i + 1) * rows, :] = v

    bc_i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    bc_f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)

    pk = bounce._SmemPk(pk_ref)
    sample_base = sb_ref[0]

    item = bc_i(rd(0))
    fresh = rd(1) != 0.0
    depth = bc_i(rd(2))
    o = (rd(3), rd(4), rd(5))
    d = (rd(6), rd(7), rd(8))
    time = rd(9)
    rad = (rd(10), rd(11), rd(12))
    tp = (rd(13), rd(14), rd(15))
    dt = time.dtype

    alive = item < n_work
    pix_local = jax.lax.rem(item, n_pix)
    pass_idx = jax.lax.div(item, n_pix)
    gpix = pix0 + pix_local
    gitem = (sample_base + pass_idx) * total_pix + gpix
    ys = jax.lax.div(gpix, plan.nx)
    xs = jax.lax.rem(gpix, plan.nx)

    o, d, time, rad, tp, scattering = bounce.step(
        plan, pk, gitem, xs.astype(dt), ys.astype(dt),
        fresh & alive, alive, depth, o, d, time, rad, tp)

    terminated = alive & ~scattering
    # flush slots: [pix (bitcast), x, y, z] for this grid step
    flush[0, 0 * rows:1 * rows, :] = bc_f(
        jnp.where(terminated, pix_local, -1))
    flush[0, 1 * rows:2 * rows, :] = jnp.where(terminated, rad[0], 0.0)
    flush[0, 2 * rows:3 * rows, :] = jnp.where(terminated, rad[1], 0.0)
    flush[0, 3 * rows:4 * rows, :] = jnp.where(terminated, rad[2], 0.0)
    seg[step_i] = jnp.sum(alive.astype(jnp.int32))

    wr(0, bc_f(jnp.where(terminated, item + jnp.int32(m), item)))
    wr(1, terminated.astype(jnp.float32))
    wr(2, bc_f(jnp.where(scattering, depth + 1, 0)))
    for i, v in enumerate(o):
        wr(3 + i, v)
    for i, v in enumerate(d):
        wr(6 + i, v)
    wr(9, time)
    for i, v in enumerate(rad):
        wr(10 + i, v)
    for i, v in enumerate(tp):
        wr(13 + i, v)


def _make_call(plan, m, n_work, n_pix, pix0, total_pix, T=CHUNK_T,
               interpret: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert m % 128 == 0
    rows = m // 128
    P = plan.size

    state_spec = pl.BlockSpec((N_STATE * rows, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    flush_spec = pl.BlockSpec((1, 4 * rows, 128), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((T,), lambda i: (0,),
                            memory_space=pltpu.SMEM)
    pk_spec = pl.BlockSpec((1, P), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    sb_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    kern = functools.partial(_kernel, plan, m, n_work, n_pix, pix0,
                             total_pix)
    call = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[pk_spec, sb_spec, state_spec],
        out_specs=[state_spec, flush_spec, seg_spec],
        out_shape=[
            jax.ShapeDtypeStruct((N_STATE * rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, 4 * rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((T,), jnp.int32),
        ],
        interpret=interpret,
    )
    return call


def render_pool_persistent(scene, cam, config, raw0, sample_base, pix0=0,
                           total_pix=None, interpret: bool = False):
    """Drop-in render_pool_fused with the persistent-state kernel."""
    n_pix = raw0.shape[0]
    total_pix = config.n_pixels if total_pix is None else total_pix
    n_work = n_pix * config.spp
    pool_cap = max(128, config.resolve_pool_rays() // 128 * 128)
    m = max(128, min(pool_cap, ((n_work + 127) // 128) * 128))
    rows = m // 128
    dtype = raw0.dtype
    T = CHUNK_T
    assert dtype == jnp.float32, "persistent kernel packs state as f32"

    plan = bounce.make_plan(scene, config)
    assert not plan.has_image   # experimental pool: no texel atlas
    if plan.attr_sweep:           # experimental pools: pk-only sweep
        import dataclasses
        plan = dataclasses.replace(plan, attr_sweep=False)
    pk = bounce.pack(scene, cam, plan, dtype).reshape(1, -1)
    call = _make_call(plan, m, n_work, n_pix, pix0, total_pix, T,
                      interpret=interpret)
    sb = jnp.asarray(sample_base, jnp.int32).reshape(1)

    item0 = jnp.arange(m, dtype=jnp.int32).reshape(rows, 128)
    state = jnp.zeros((N_STATE * rows, 128), jnp.float32)
    state = state.at[0:rows].set(
        jax.lax.bitcast_convert_type(item0, jnp.float32))
    state = state.at[rows:2 * rows].set(1.0)           # fresh

    def cond(carry):
        state, raw3, segments, iters = carry
        item = jax.lax.bitcast_convert_type(state[0:rows], jnp.int32)
        return jnp.any(item < n_work)

    def body(carry):
        state, raw3, segments, iters = carry
        state, flush, segs = call(pk, sb, state)
        fpix = jax.lax.bitcast_convert_type(
            flush[:, 0:rows, :], jnp.int32)
        valid = fpix >= 0
        idx = jnp.where(valid, fpix, 0).reshape(-1)
        vals = jnp.stack([flush[:, rows:2 * rows, :].reshape(-1),
                          flush[:, 2 * rows:3 * rows, :].reshape(-1),
                          flush[:, 3 * rows:4 * rows, :].reshape(-1)],
                         axis=0)
        raw3 = raw3.at[:, idx].add(jnp.where(valid.reshape(-1)[None, :],
                                             vals, 0.0))
        return (state, raw3, segments + jnp.sum(segs, dtype=jnp.int32),
                iters + T)

    carry = (state, raw0.T, jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32))
    state, raw3, segments, iters = jax.lax.while_loop(cond, body, carry)
    return raw3.T, segments, iters


def supported(scene, config) -> bool:
    return bounce.supported(scene, config)

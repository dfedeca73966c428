"""Packed-state regeneration pool: one buffer across the kernel boundary.

Chip profiling showed per-bounce wall time is dominated by a ~constant
overhead proportional to the number of buffers crossing the loop/kernel
boundary (the Pallas step itself is ~20% at the optimal pool size).  Here
one bounce iteration is bounce.as_pallas_packed — a single one-in/one-out
kernel holding the whole pool state in one (16*rows, 128) f32 buffer with
the strided work queue fused inside — and the XLA glue per iteration is
just the staging of terminated-path radiance (read straight out of the
state buffer: `fresh == 1` marks lanes whose rad slots hold a completed
path; its work item is `item - m`).  Framebuffer scatter still runs once
every F iterations.  Estimator, RNG streams, and per-pixel accumulation
order are identical to the FIFO pools (see pool_strided.py's argument).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import bounce

FLUSH_EVERY = 8


class PackedState(NamedTuple):
    st: jnp.ndarray       # [16*rows, 128] packed pool state
    seq_x: jnp.ndarray; seq_y: jnp.ndarray; seq_z: jnp.ndarray  # [F, M]
    seq_pix: jnp.ndarray  # [F, M] i32, -1 = no flush
    raw3: jnp.ndarray     # [3, n_pix]
    segments: jnp.ndarray
    iters: jnp.ndarray


def supported(scene, config) -> bool:
    return bounce.supported(scene, config)


def render_pool_packed(scene, cam, config, raw0, sample_base, pix0=0,
                       total_pix=None, interpret=None):
    n_pix = raw0.shape[0]
    total_pix = config.n_pixels if total_pix is None else total_pix
    n_work = n_pix * config.spp
    pool_cap = max(128, config.resolve_pool_rays() // 128 * 128)
    m = max(128, min(pool_cap, ((n_work + 127) // 128) * 128))
    rows = m // 128
    dtype = raw0.dtype
    F = FLUSH_EVERY
    assert dtype == jnp.float32, "packed pool stores state as f32"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    plan = bounce.make_plan(scene, config)
    assert not plan.has_image   # experimental pool: no texel atlas
    if plan.attr_sweep:           # experimental pools: pk-only sweep
        import dataclasses
        plan = dataclasses.replace(plan, attr_sweep=False)
    pk = bounce.pack(scene, cam, plan, dtype).reshape(1, -1)
    sb = jnp.asarray(sample_base, jnp.int32).reshape(1)
    kern = bounce.as_pallas_packed(plan, m, n_work, n_pix, pix0, total_pix,
                                   interpret=interpret)

    item0 = jnp.arange(m, dtype=jnp.int32).reshape(rows, 128)
    st0 = jnp.zeros((bounce.N_PACKED * rows, 128), jnp.float32)
    st0 = st0.at[0:rows].set(
        jax.lax.bitcast_convert_type(item0, jnp.float32))
    st0 = st0.at[rows:2 * rows].set(1.0)               # fresh

    state = PackedState(
        st=st0,
        seq_x=jnp.zeros((F, m), dtype), seq_y=jnp.zeros((F, m), dtype),
        seq_z=jnp.zeros((F, m), dtype),
        seq_pix=jnp.full((F, m), -1, jnp.int32),
        raw3=raw0.T,
        segments=jnp.zeros((), jnp.int32),
        iters=jnp.zeros((), jnp.int32),
    )

    def bounce_iter(k, s: PackedState) -> PackedState:
        item_before = jax.lax.bitcast_convert_type(s.st[0:rows],
                                                   jnp.int32).reshape(m)
        alive = item_before < n_work
        st = kern(pk, sb, s.st)

        item_after = jax.lax.bitcast_convert_type(st[0:rows],
                                                  jnp.int32).reshape(m)
        terminated = st[rows:2 * rows].reshape(m) != 0.0
        pix_prev = (item_after - m) % n_pix           # completed work item
        row = lambda buf, v: jax.lax.dynamic_update_slice_in_dim(
            buf, v[None, :], k, axis=0)
        return PackedState(
            st,
            row(s.seq_x, st[10 * rows:11 * rows].reshape(m)),
            row(s.seq_y, st[11 * rows:12 * rows].reshape(m)),
            row(s.seq_z, st[12 * rows:13 * rows].reshape(m)),
            row(s.seq_pix, jnp.where(terminated, pix_prev, -1)),
            s.raw3,
            s.segments + jnp.sum(alive, dtype=jnp.int32),
            s.iters + 1)

    def body(s: PackedState) -> PackedState:
        s = jax.lax.fori_loop(0, F, bounce_iter, s)
        valid = s.seq_pix >= 0
        idx = jnp.where(valid, s.seq_pix, 0).reshape(-1)
        vals = jnp.stack([s.seq_x.reshape(-1), s.seq_y.reshape(-1),
                          s.seq_z.reshape(-1)], axis=0)
        vals = jnp.where(valid.reshape(-1)[None, :], vals, 0.0)
        raw3 = s.raw3.at[:, idx].add(vals)
        return s._replace(raw3=raw3,
                          seq_pix=jnp.full_like(s.seq_pix, -1))

    def cond(s: PackedState):
        item = jax.lax.bitcast_convert_type(s.st[0:rows], jnp.int32)
        return jnp.any(item < n_work)

    state = jax.lax.while_loop(cond, body, state)
    return state.raw3.T, state.segments, state.iters

"""Strided-work regeneration pool: pool_fused minus the queue glue.

Profiling the fused pool on the chip showed the Pallas bounce kernel is
only ~20% of each iteration's wall time at the optimal pool size — the
rest is the XLA glue between kernel launches: the FIFO work queue's
cross-lane prefix sum, the one-hot staging writes, and the camera re-issue
ops.  This pool removes almost all of it:

  * STRIDED work assignment (lane L processes items L, L+m, L+2m, ...):
    re-issue is `item += m`, a single per-lane update — no cumsum, no
    cross-lane communication.  Work items for one pixel always land on the
    same lane in pass order, so per-pixel accumulation order (and the
    work-item-keyed RNG) is unchanged — the ESTIMATOR is identical to the
    FIFO pool; only lane load-balance differs, costing a slightly longer
    drain tail.
  * staging is a plain row write into [F, m] buffers (one
    dynamic_update_slice per iteration) instead of one-hot masked adds;
    the framebuffer scatter still runs once every F iterations.

Same fused bounce step (Pallas megakernel on TPU via the mosaic_lowers
gate, jnp elsewhere); same return contract as render_pool_fused.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import bounce

FLUSH_EVERY = 8


class StridedState(NamedTuple):
    ox: jnp.ndarray; oy: jnp.ndarray; oz: jnp.ndarray
    dx: jnp.ndarray; dy: jnp.ndarray; dz: jnp.ndarray
    time: jnp.ndarray
    rx: jnp.ndarray; ry: jnp.ndarray; rz: jnp.ndarray
    tx: jnp.ndarray; ty: jnp.ndarray; tz: jnp.ndarray
    item: jnp.ndarray     # [M] i32 current work item (strided stream)
    fresh: jnp.ndarray    # [M] bool
    depth: jnp.ndarray    # [M] i32
    seq_x: jnp.ndarray; seq_y: jnp.ndarray; seq_z: jnp.ndarray  # [F, M]
    seq_pix: jnp.ndarray  # [F, M] i32, -1 = no flush
    raw3: jnp.ndarray     # [3, n_pix]
    segments: jnp.ndarray
    iters: jnp.ndarray


def render_pool_strided(scene, cam, config, raw0, sample_base, pix0=0,
                        total_pix=None, vary_axes=(), static_iters=None):
    """`static_iters=None`: while_loop drain (forward).  A static count
    switches to a fixed-length scan — the reverse-mode-differentiable
    variant (same contract as pool_fused's scan mode: returns leftover
    instead of iters; jnp step only)."""
    n_pix = raw0.shape[0]
    total_pix = config.n_pixels if total_pix is None else total_pix
    n_work = n_pix * config.spp
    pool_cap = max(128, config.resolve_pool_rays() // 128 * 128)
    m = max(128, min(pool_cap, ((n_work + 127) // 128) * 128))
    dtype = raw0.dtype
    F = FLUSH_EVERY

    plan = bounce.make_plan(scene, config)
    assert not plan.has_image   # experimental pool: no texel atlas
    if plan.attr_sweep:           # experimental pools: pk-only sweep
        import dataclasses
        plan = dataclasses.replace(plan, attr_sweep=False)
    pk = bounce.pack(scene, cam, plan, dtype)
    if static_iters is not None:
        use_pallas = False
    elif config.use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and bounce.pallas_ok(plan)
                      and bounce.mosaic_lowers(plan, m, config.dtype))
    else:
        use_pallas = config.use_pallas
    step = bounce.as_pallas(plan, m) if use_pallas else bounce.step

    sb = jnp.asarray(sample_base, jnp.int32)
    z = jnp.zeros(m, dtype)
    state = StridedState(
        ox=z, oy=z, oz=z, dx=z, dy=z, dz=jnp.ones(m, dtype), time=z,
        rx=z, ry=z, rz=z, tx=z, ty=z, tz=z,
        item=jnp.arange(m, dtype=jnp.int32),
        fresh=jnp.ones(m, bool),
        depth=jnp.zeros(m, jnp.int32),
        seq_x=jnp.zeros((F, m), dtype), seq_y=jnp.zeros((F, m), dtype),
        seq_z=jnp.zeros((F, m), dtype),
        seq_pix=jnp.full((F, m), -1, jnp.int32),
        raw3=raw0.T,
        segments=jnp.zeros((), jnp.int32),
        iters=jnp.zeros((), jnp.int32),
    )
    if vary_axes:
        def _vary(x):
            have = getattr(jax.typeof(x), "vma", frozenset())
            need = tuple(a for a in vary_axes if a not in have)
            return jax.lax.pcast(x, need, to='varying') if need else x
        state = jax.tree.map(_vary, state)

    def bounce_iter(k, st: StridedState) -> StridedState:
        item = st.item
        alive = item < n_work
        pixl = item % n_pix
        gpix = pix0 + pixl
        gitem = (sb + item // n_pix) * total_pix + gpix
        ys, xs = jnp.divmod(gpix, config.nx)

        o, d, time, rad, tp, scattering = step(
            plan, pk, gitem, xs.astype(dtype), ys.astype(dtype),
            st.fresh & alive, alive, st.depth,
            (st.ox, st.oy, st.oz), (st.dx, st.dy, st.dz), st.time,
            (st.rx, st.ry, st.rz), (st.tx, st.ty, st.tz))

        terminated = alive & ~scattering
        row = lambda buf, v: jax.lax.dynamic_update_slice_in_dim(
            buf, v[None, :], k, axis=0)
        seq_pix = row(st.seq_pix, jnp.where(terminated, pixl, -1))
        seq_x = row(st.seq_x, rad[0])
        seq_y = row(st.seq_y, rad[1])
        seq_z = row(st.seq_z, rad[2])

        item = jnp.where(terminated, item + m, item)
        depth = jnp.where(scattering, st.depth + 1, 0)
        segments = st.segments + jnp.sum(alive, dtype=jnp.int32)
        return StridedState(
            o[0], o[1], o[2], d[0], d[1], d[2], time,
            rad[0], rad[1], rad[2], tp[0], tp[1], tp[2],
            item, terminated, depth,
            seq_x, seq_y, seq_z, seq_pix,
            st.raw3, segments, st.iters + 1)

    def body(st: StridedState) -> StridedState:
        st = jax.lax.fori_loop(0, F, bounce_iter, st)
        valid = st.seq_pix >= 0
        idx = jnp.where(valid, st.seq_pix, 0).reshape(-1)
        vals = jnp.stack([st.seq_x.reshape(-1), st.seq_y.reshape(-1),
                          st.seq_z.reshape(-1)], axis=0)
        vals = jnp.where(valid.reshape(-1)[None, :], vals, 0.0)
        raw3 = st.raw3.at[:, idx].add(vals)
        return st._replace(raw3=raw3,
                           seq_pix=jnp.full_like(st.seq_pix, -1))

    if static_iters is None:
        state = jax.lax.while_loop(lambda s: jnp.any(s.item < n_work), body,
                                   state)
        return state.raw3.T, state.segments, state.iters

    n_blocks = max(1, -(-int(static_iters) // F))
    state, _ = jax.lax.scan(
        jax.checkpoint(lambda s, _: (body(s), None)), state, None,
        length=n_blocks)
    leftover = jnp.sum(state.item < n_work, dtype=jnp.int32)
    return state.raw3.T, state.segments, leftover

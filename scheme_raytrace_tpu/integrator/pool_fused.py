"""Regeneration pool over the fused SoA bounce step (integrator/bounce.py).

Same estimator, work queue, and RNG streams as integrator/pool.py, but:
  * pool state is struct-of-scalars ([M] per component, never [M, 3]) so
    every glue op runs on densely-tiled lanes — on TPU a minor axis of 3
    (or F) pads to the 128-lane tile and taxes every op ~40x (measured);
  * the bounce itself is one fused step — on TPU a Pallas megakernel
    (bounce.as_pallas), elsewhere the same code traced as plain jnp;
  * the framebuffer flush is BATCHED: terminated radiances are staged in
    [F, M] sequence buffers via a dense one-hot write (cheap), and the
    expensive scatter-add runs once every F bounce iterations (TPU scatter
    has ~1.6 ms fixed cost per call at this size — measured — so
    amortizing it F-fold is most of the win).  The framebuffer lives as
    [3, n_pix] planes internally so the scatter's operand and updates are
    both densely tiled; it is transposed back once per render.

Within F iterations a lane terminates at most F times (one per iteration),
so F staging columns can never overflow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import bounce

FLUSH_EVERY = 8     # F: bounce iterations per framebuffer scatter

# Which step implementation the most recent render_pool_fused trace picked,
# keyed by direction: {"forward": "pallas"|"jnp", "reverse":
# "pallas-vjp"|"jnp"}.  Set at TRACE time (the moment the choice is made),
# so bench artifacts can record what actually executed instead of "auto"
# (a silent gate downgrade was indistinguishable in BENCH_r03).
LAST_STEP_IMPL: dict = {}


class FusedState(NamedTuple):
    ox: jnp.ndarray; oy: jnp.ndarray; oz: jnp.ndarray
    dx: jnp.ndarray; dy: jnp.ndarray; dz: jnp.ndarray
    time: jnp.ndarray
    rx: jnp.ndarray; ry: jnp.ndarray; rz: jnp.ndarray     # path radiance
    tx: jnp.ndarray; ty: jnp.ndarray; tz: jnp.ndarray     # throughput
    item: jnp.ndarray     # [M] i32 local work item
    gitem: jnp.ndarray    # [M] i32 global work item (RNG key)
    px: jnp.ndarray       # [M] f32 pixel x (precomputed for the kernel)
    py: jnp.ndarray       # [M] f32 pixel y
    fresh: jnp.ndarray    # [M] bool — regenerate this lane's camera ray
    depth: jnp.ndarray    # [M] i32 bounces completed on current path
    alive: jnp.ndarray    # [M] bool
    next_w: jnp.ndarray   # scalar i32
    seq_x: jnp.ndarray; seq_y: jnp.ndarray; seq_z: jnp.ndarray  # [F, M]
    seq_pix: jnp.ndarray  # [F, M] i32 (0-init: flushes add 0.0 — harmless)
    seq_k: jnp.ndarray    # [M] i32 staged count since last flush
    raw3: jnp.ndarray     # [3, n_pix] framebuffer planes
    segments: jnp.ndarray
    iters: jnp.ndarray


def _issue(item, config, sample_base, n_pix, pix0, total_pix,
           stride=1, offset=0):
    """(gitem, px, py, pix_local) for local work items.

    Default (stride=1, offset=0): pass-major over this shard's n_pix
    pixels starting at pix0 (band/row sharding — same mapping as pool.py).
    With stride=n_dev, offset=shard: local item k maps to GLOBAL work item
    k*n_dev + shard — the interleaved sharding of parallel.pool's
    balanced mode, where every shard samples the whole frame (n_pix =
    total_pix, pix0 = 0) and partial framebuffers are psum'd.  The RNG is
    keyed by the global item either way, so the union of all shards'
    samples is the exact unsharded sample set.
    """
    g = item * stride + offset
    pix_local = g % n_pix
    pass_idx = g // n_pix
    gpix = pix0 + pix_local
    gitem = (sample_base + pass_idx) * total_pix + gpix
    ys, xs = jnp.divmod(gpix, config.nx)
    return gitem, xs, ys, pix_local


def render_pool_fused(scene, cam, config, raw0, sample_base, pix0=0,
                      total_pix=None, vary_axes=(), static_iters=None,
                      item_stride=1, item_offset=0):
    """Drop-in render_pool with the fused bounce; same return contract.

    `static_iters=None` (forward rendering) drains the work queue with a
    `while_loop`.  A static iteration count switches to a fixed-length
    `scan` — the REVERSE-MODE-DIFFERENTIABLE pool (integrator/diff_fused):
    same estimator, same RNG, bit-identical image, but with a static trip
    count so jax.grad applies; the caller must size static_iters to drain
    the queue (checked via the returned leftover count).  On TPU the scan
    path differentiates through the custom-VJP megakernel.

    `item_stride`/`item_offset`: interleaved work sharding (see _issue) —
    this shard processes global work items k*stride + offset; raw0 must
    then be the FULL frame and the caller psums partial framebuffers.
    """
    n_pix = raw0.shape[0]
    total_pix = config.n_pixels if total_pix is None else total_pix
    n_work_global = n_pix * config.spp
    assert n_work_global % item_stride == 0, (n_work_global, item_stride)
    n_work = n_work_global // item_stride      # LOCAL work items
    # Both bounds 128-aligned: a user-set --pool-rays that is not a multiple
    # of 128 must not leak through (bounce.as_pallas asserts m % 128 == 0).
    pool_cap = max(128, config.pool_rays // 128 * 128)
    m = max(128, min(pool_cap, ((n_work + 127) // 128) * 128))
    dtype = raw0.dtype
    F = FLUSH_EVERY

    plan = bounce.make_plan(scene, config)
    pk = bounce.pack(scene, cam, plan, dtype)
    # Auto mode gates on a real Mosaic lowering (bounce.mosaic_lowers) so an
    # unsupported primitive degrades to the jnp step instead of crashing the
    # render; use_pallas=True skips the gate and fails loudly.  The static
    # (reverse-mode) path uses the custom-VJP megakernel (Pallas forward AND
    # backward) behind its own compile-to-binary gate.
    use_vjp_kernel = False
    if static_iters is not None:
        if config.use_pallas is None:
            use_vjp_kernel = (jax.default_backend() == "tpu"
                              and bounce.pallas_ok(plan)
                              and bounce.mosaic_compiles_vjp(plan, m,
                                                             config.dtype))
        else:
            use_vjp_kernel = config.use_pallas
        use_pallas = False
        step = (bounce.as_pallas_vjp(plan, m) if use_vjp_kernel
                else bounce.step)
        LAST_STEP_IMPL["reverse"] = "pallas-vjp" if use_vjp_kernel else "jnp"
    else:
        if config.use_pallas is None:
            use_pallas = (jax.default_backend() == "tpu"
                          and bounce.pallas_ok(plan)
                          and bounce.mosaic_lowers(plan, m, config.dtype))
        else:
            use_pallas = config.use_pallas
        step = bounce.as_pallas(plan, m) if use_pallas else bounce.step
        LAST_STEP_IMPL["forward"] = "pallas" if use_pallas else "jnp"

    item0 = jnp.arange(m, dtype=jnp.int32)
    gitem0, xs0, ys0, _ = _issue(item0, config, sample_base, n_pix, pix0,
                                 total_pix, item_stride, item_offset)
    z = jnp.zeros(m, dtype)
    zi = jnp.zeros(m, jnp.int32)
    state = FusedState(
        ox=z, oy=z, oz=z, dx=z, dy=z, dz=jnp.ones(m, dtype), time=z,
        rx=z, ry=z, rz=z, tx=z, ty=z, tz=z,
        item=item0, gitem=gitem0,
        px=xs0.astype(dtype), py=ys0.astype(dtype),
        fresh=item0 < n_work,
        depth=zi, alive=item0 < n_work,
        next_w=jnp.asarray(m, jnp.int32),
        seq_x=jnp.zeros((F, m), dtype), seq_y=jnp.zeros((F, m), dtype),
        seq_z=jnp.zeros((F, m), dtype),
        seq_pix=jnp.zeros((F, m), jnp.int32),
        seq_k=zi,
        raw3=raw0.T,
        segments=jnp.zeros((), jnp.int32),
        iters=jnp.zeros((), jnp.int32),
    )
    if vary_axes:
        def _vary(x):
            have = getattr(jax.typeof(x), "vma", frozenset())
            need = tuple(a for a in vary_axes if a not in have)
            return jax.lax.pvary(x, need) if need else x
        state = jax.tree.map(_vary, state)

    col = jax.lax.broadcasted_iota(jnp.int32, (F, m), 0)

    def bounce_iter(_, st: FusedState) -> FusedState:
        o, d, time, rad, tp, scattering = step(
            plan, pk, st.gitem, st.px, st.py, st.fresh, st.alive, st.depth,
            (st.ox, st.oy, st.oz), (st.dx, st.dy, st.dz), st.time,
            (st.rx, st.ry, st.rz), (st.tx, st.ty, st.tz))

        # --- stage finished paths in the sequence buffer -------------------
        terminated = st.alive & ~scattering
        pixl = (st.item * item_stride + item_offset) % n_pix
        onehot = (col == st.seq_k[None, :]) & terminated[None, :]
        seq_x = st.seq_x + jnp.where(onehot, rad[0][None, :], 0.0)
        seq_y = st.seq_y + jnp.where(onehot, rad[1][None, :], 0.0)
        seq_z = st.seq_z + jnp.where(onehot, rad[2][None, :], 0.0)
        seq_pix = jnp.where(onehot, pixl[None, :], st.seq_pix)
        seq_k = st.seq_k + terminated.astype(jnp.int32)

        # --- re-issue freed lanes the next work items ----------------------
        t_i32 = terminated.astype(jnp.int32)
        new_local = st.next_w + jnp.cumsum(t_i32) - t_i32
        has_work = terminated & (new_local < n_work)
        item = jnp.where(has_work, new_local, st.item)
        gitem_new, xs, ys, _ = _issue(item, config, sample_base, n_pix,
                                      pix0, total_pix, item_stride,
                                      item_offset)
        gitem = jnp.where(has_work, gitem_new, st.gitem)
        px = jnp.where(has_work, xs.astype(dtype), st.px)
        py = jnp.where(has_work, ys.astype(dtype), st.py)
        depth = jnp.where(scattering, st.depth + 1,
                          jnp.where(has_work, 0, st.depth))
        alive = scattering | has_work
        next_w = jnp.minimum(st.next_w + jnp.sum(t_i32, dtype=jnp.int32),
                             n_work)
        segments = st.segments + jnp.sum(st.alive, dtype=jnp.int32)
        return FusedState(
            o[0], o[1], o[2], d[0], d[1], d[2], time,
            rad[0], rad[1], rad[2], tp[0], tp[1], tp[2],
            item, gitem, px, py, has_work, depth, alive, next_w,
            seq_x, seq_y, seq_z, seq_pix, seq_k,
            st.raw3, segments, st.iters + 1)

    def body(st: FusedState) -> FusedState:
        st = jax.lax.fori_loop(0, F, bounce_iter, st)
        # --- flush staged radiances: ONE scatter per F iterations ----------
        idx = st.seq_pix.reshape(-1)
        vals = jnp.stack([st.seq_x.reshape(-1), st.seq_y.reshape(-1),
                          st.seq_z.reshape(-1)], axis=0)      # [3, F*M] dense
        raw3 = st.raw3.at[:, idx].add(vals)
        return st._replace(
            raw3=raw3,
            seq_x=jnp.zeros_like(st.seq_x), seq_y=jnp.zeros_like(st.seq_y),
            seq_z=jnp.zeros_like(st.seq_z),
            seq_pix=jnp.zeros_like(st.seq_pix),
            seq_k=jnp.zeros_like(st.seq_k))

    if static_iters is None:
        state = jax.lax.while_loop(lambda s: jnp.any(s.alive), body, state)
        return state.raw3.T, state.segments, state.iters

    # --- fixed-length scan (reverse-mode path) -----------------------------
    # The while_loop drain is rewritten as scan-over-blocks with scan-over-F
    # inside (same F-block flush structure; a static-bound fori_loop would
    # also scan-lower, but the explicit scans make the checkpoint placement
    # and per-step residual story visible).  With the jnp step each block is
    # jax.checkpoint'd: backward stores one carry per F iterations and
    # recomputes the block's bounce chain (the jnp step's tape of
    # per-intermediate residuals would dwarf the carry).  With the
    # custom-VJP megakernel the step's residuals ARE its inputs (the pool
    # carry), so storing them all is cheap and the checkpoint's forward
    # recompute would only burn kernel time — no checkpoint.
    n_blocks = max(1, -(-int(static_iters) // F))

    def block(st: FusedState, _):
        st, _ = jax.lax.scan(lambda s, __: (bounce_iter(0, s), None),
                             st, None, length=F)
        return body_flush(st), None

    def body_flush(st: FusedState) -> FusedState:
        idx = st.seq_pix.reshape(-1)
        vals = jnp.stack([st.seq_x.reshape(-1), st.seq_y.reshape(-1),
                          st.seq_z.reshape(-1)], axis=0)
        raw3 = st.raw3.at[:, idx].add(vals)
        return st._replace(
            raw3=raw3,
            seq_x=jnp.zeros_like(st.seq_x), seq_y=jnp.zeros_like(st.seq_y),
            seq_z=jnp.zeros_like(st.seq_z),
            seq_pix=jnp.zeros_like(st.seq_pix),
            seq_k=jnp.zeros_like(st.seq_k))

    blockfn = block if use_vjp_kernel else jax.checkpoint(block)
    state, _ = jax.lax.scan(blockfn, state, None, length=n_blocks)
    leftover = (jnp.sum(state.alive, dtype=jnp.int32)
                + (n_work - state.next_w))
    return state.raw3.T, state.segments, leftover

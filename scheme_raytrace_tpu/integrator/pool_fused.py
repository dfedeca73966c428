"""Regeneration pool over the fused SoA bounce step (integrator/bounce.py).

Same estimator and RNG streams as integrator/pool.py, but:
  * pool state is struct-of-scalars ([M] per component, never [M, 3]) so
    every glue op runs on densely-tiled lanes — on TPU a minor axis of 3
    (or F) pads to the 128-lane tile and taxes every op ~40x (measured);
  * the bounce itself is one fused step — on TPU a Pallas megakernel
    (bounce.as_pallas), elsewhere the same code traced as plain jnp;
  * the WORK UNIT IS A PIXEL, not a path: a lane renders all config.spp
    jittered paths of its pixel back-to-back, summing them in-lane in
    pass order, and stages ONE accumulated value per finished pixel.
    Round-4 profiling showed the framebuffer flush scatter dominating the
    whole forward render (84% of wall time at 512^2 — its cost scales
    with staged SLOTS, not real updates, which is why sweeping the flush
    cadence F never moved it).  Pixel work units make completions on a
    lane at least spp iterations apart, so the staging buffer needs only
    S = (F-1)//spp + 1 rows instead of F — an spp-fold scatter-slot
    reduction — while keeping the ESTIMATOR BIT-IDENTICAL for fresh
    renders: each pixel's passes are summed in pass order starting from
    0.0 either way, and the RNG is keyed by the global (pass, pixel) id.
  * the flush is BATCHED: staged pixels go to [S, M] sequence buffers via
    a dense one-hot write, and the scatter-add runs once every F bounce
    iterations into [3, n_pix] framebuffer planes (densely tiled;
    transposed back once per render).

Within any F-iteration window a lane finishes at most S pixels (each
pixel needs >= spp iterations — one per path at minimum), so the S
staging rows can never overflow.
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
    ax: jnp.ndarray; ay: jnp.ndarray; az: jnp.ndarray     # pixel pass sum
    item: jnp.ndarray     # [M] i32 local work item (a PIXEL)
    pass_idx: jnp.ndarray  # [M] i32 current pass within the pixel
    px: jnp.ndarray       # [M] f32 pixel x (precomputed for the kernel)
    py: jnp.ndarray       # [M] f32 pixel y
    fresh: jnp.ndarray    # [M] bool — regenerate this lane's camera ray
    depth: jnp.ndarray    # [M] i32 bounces completed on current path
    alive: jnp.ndarray    # [M] bool
    next_w: jnp.ndarray   # scalar i32
    seq_x: jnp.ndarray; seq_y: jnp.ndarray; seq_z: jnp.ndarray  # [S, M]
    seq_pix: jnp.ndarray  # [S, M] i32 (0-init: flushes add 0.0 — harmless)
    seq_k: jnp.ndarray    # [M] i32 staged count since last flush
    raw3: jnp.ndarray     # [3, n_pix] framebuffer planes
    segments: jnp.ndarray
    iters: jnp.ndarray


def _pixel_of(item, n_pix, stride, offset):
    """Local frame pixel of a work item.

    Default (stride=1, offset=0): item IS the pixel.  With stride=n_dev,
    offset=shard: local item k maps to GLOBAL pixel k*n_dev + shard — the
    interleaved sharding of parallel.pool's balanced mode, where every
    shard samples the whole frame and partial framebuffers are psum'd.
    The modulo only sanitizes dead padding lanes (item >= n_work)."""
    return (item * stride + offset) % n_pix


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

    `item_stride`/`item_offset`: interleaved pixel sharding (_pixel_of) —
    this shard renders global pixels k*stride + offset; raw0 must then be
    the FULL frame and the caller psums partial framebuffers.
    """
    n_pix = raw0.shape[0]
    total_pix = config.n_pixels if total_pix is None else total_pix
    spp = config.spp
    assert n_pix % item_stride == 0, (n_pix, item_stride)
    n_work = n_pix // item_stride              # LOCAL work items (pixels)
    # Both bounds 128-aligned: a user-set --pool-rays that is not a multiple
    # of 128 must not leak through (bounce.as_pallas asserts m % 128 == 0).
    pool_cap = max(128, config.pool_rays // 128 * 128)
    m = max(128, min(pool_cap, ((n_work + 127) // 128) * 128))
    dtype = raw0.dtype
    F = FLUSH_EVERY
    S = (F - 1) // spp + 1                     # staging rows (see module doc)

    plan = bounce.make_plan(scene, config)
    pk = bounce.pack(scene, cam, plan, dtype)
    # Auto mode gates on a real Mosaic compile (bounce.mosaic_lowers) so an
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
    pixl0 = _pixel_of(item0, n_pix, item_stride, item_offset)
    ys0, xs0 = jnp.divmod(pix0 + pixl0, config.nx)
    z = jnp.zeros(m, dtype)
    zi = jnp.zeros(m, jnp.int32)
    state = FusedState(
        ox=z, oy=z, oz=z, dx=z, dy=z, dz=jnp.ones(m, dtype), time=z,
        rx=z, ry=z, rz=z, tx=z, ty=z, tz=z,
        ax=z, ay=z, az=z,
        item=item0, pass_idx=zi,
        px=xs0.astype(dtype), py=ys0.astype(dtype),
        fresh=item0 < n_work,
        depth=zi, alive=item0 < n_work,
        next_w=jnp.asarray(m, jnp.int32),
        seq_x=jnp.zeros((S, m), dtype), seq_y=jnp.zeros((S, m), dtype),
        seq_z=jnp.zeros((S, m), dtype),
        seq_pix=jnp.zeros((S, m), jnp.int32),
        seq_k=zi,
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

    col = jax.lax.broadcasted_iota(jnp.int32, (S, m), 0)

    def bounce_iter(_, st: FusedState) -> FusedState:
        # RNG key: the global (pass, pixel) work item — identical stream
        # to the per-path pools, shard- and band-invariant
        pixl = _pixel_of(st.item, n_pix, item_stride, item_offset)
        gitem = (sample_base + st.pass_idx) * total_pix + (pix0 + pixl)
        o, d, time, rad, tp, scattering = step(
            plan, pk, gitem, st.px, st.py, st.fresh, st.alive, st.depth,
            (st.ox, st.oy, st.oz), (st.dx, st.dy, st.dz), st.time,
            (st.rx, st.ry, st.rz), (st.tx, st.ty, st.tz))

        # --- fold the finished path into the lane's pixel sum --------------
        path_done = st.alive & ~scattering
        ax = st.ax + jnp.where(path_done, rad[0], 0.0)
        ay = st.ay + jnp.where(path_done, rad[1], 0.0)
        az = st.az + jnp.where(path_done, rad[2], 0.0)
        more = path_done & (st.pass_idx < spp - 1)     # next pass, same pixel
        pixel_done = path_done & (st.pass_idx >= spp - 1)

        # --- stage finished pixels in the sequence buffer -------------------
        onehot = (col == st.seq_k[None, :]) & pixel_done[None, :]
        seq_x = st.seq_x + jnp.where(onehot, ax[None, :], 0.0)
        seq_y = st.seq_y + jnp.where(onehot, ay[None, :], 0.0)
        seq_z = st.seq_z + jnp.where(onehot, az[None, :], 0.0)
        seq_pix = jnp.where(onehot, pixl[None, :], st.seq_pix)
        seq_k = st.seq_k + pixel_done.astype(jnp.int32)

        # --- re-issue freed lanes the next pixels ---------------------------
        pd = pixel_done.astype(jnp.int32)
        new_local = st.next_w + jnp.cumsum(pd) - pd     # exclusive rank
        has_work = pixel_done & (new_local < n_work)
        item = jnp.where(has_work, new_local, st.item)
        pixl_new = _pixel_of(item, n_pix, item_stride, item_offset)
        ys, xs = jnp.divmod(pix0 + pixl_new, config.nx)
        px = jnp.where(has_work, xs.astype(dtype), st.px)
        py = jnp.where(has_work, ys.astype(dtype), st.py)
        pass_idx = jnp.where(more, st.pass_idx + 1,
                             jnp.where(has_work, 0, st.pass_idx))
        ax = jnp.where(has_work, 0.0, ax)               # staged above
        ay = jnp.where(has_work, 0.0, ay)
        az = jnp.where(has_work, 0.0, az)
        fresh = more | has_work
        depth = jnp.where(scattering, st.depth + 1,
                          jnp.where(fresh, 0, st.depth))
        alive = scattering | fresh
        # dtype-pinned sums: under x64 (f64 oracle) jnp.sum(int32) promotes
        next_w = jnp.minimum(st.next_w + jnp.sum(pd, dtype=jnp.int32),
                             n_work)
        segments = st.segments + jnp.sum(st.alive, dtype=jnp.int32)
        return FusedState(
            o[0], o[1], o[2], d[0], d[1], d[2], time,
            rad[0], rad[1], rad[2], tp[0], tp[1], tp[2],
            ax, ay, az, item, pass_idx, px, py, fresh, depth, alive,
            next_w, seq_x, seq_y, seq_z, seq_pix, seq_k,
            st.raw3, segments, st.iters + 1)

    def body_flush(st: FusedState) -> FusedState:
        # --- flush staged pixels: ONE scatter per F iterations --------------
        # (A unique-indices variant — empty slots redirected to a dump pad
        # past n_pix — measured SLOWER, 100M vs 160M rays/s: the padded
        # operand loses more than the sort-free combiner saves.)
        idx = st.seq_pix.reshape(-1)
        vals = jnp.stack([st.seq_x.reshape(-1), st.seq_y.reshape(-1),
                          st.seq_z.reshape(-1)], axis=0)      # [3, S*M] dense
        raw3 = st.raw3.at[:, idx].add(vals)
        return st._replace(
            raw3=raw3,
            seq_x=jnp.zeros_like(st.seq_x), seq_y=jnp.zeros_like(st.seq_y),
            seq_z=jnp.zeros_like(st.seq_z),
            seq_pix=jnp.zeros_like(st.seq_pix),
            seq_k=jnp.zeros_like(st.seq_k))

    def body(st: FusedState) -> FusedState:
        st = jax.lax.fori_loop(0, F, bounce_iter, st)
        return body_flush(st)

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

    blockfn = block if use_vjp_kernel else jax.checkpoint(block)
    state, _ = jax.lax.scan(blockfn, state, None, length=n_blocks)
    leftover = (jnp.sum(state.alive, dtype=jnp.int32)
                + (n_work - state.next_w))
    return state.raw3.T, state.segments, leftover

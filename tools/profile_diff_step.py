"""Decompose the fwd+bwd diff-pool step cost on the live TPU.

Three scans of the SAME length/pool as the bench fwd+bwd workload
(512^2 spp8 depth100, m=24k, n_iters from calibration), each timed
forward-only and under value_and_grad:

  kernel  — the custom-VJP megakernel alone, carried state, no pool glue
            (every lane fresh each iteration: full regen+shade compute).
  glue    — kernel + the committed bounce_iter bookkeeping (staging
            one-hot, cumsum re-issue, pixel work units) but the flush
            scatter replaced by a [3]-reduction of the staged values.
  full    — the committed render_diff_fused (scatter flush included).

full-glue = scatter cost; glue-kernel = glue cost; kernel = compute+
residual-traffic floor.  Run: python tools/profile_diff_step.py [m]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scheme_raytrace_tpu import scenes
from scheme_raytrace_tpu.config import RenderConfig
from scheme_raytrace_tpu.integrator import bounce, diff_fused, pool_fused
from scheme_raytrace_tpu.scene import compile_scene
from scheme_raytrace_tpu.scene import build as sb

m = int(sys.argv[1]) if len(sys.argv) > 1 else 24 * 1024
size, spp = 512, 8
config = RenderConfig(nx=size, ny=size, spp=spp, max_depth=100,
                      light_sampling=True, seed=0, pool_rays=m)
spec = scenes.cornell_box()
scene = compile_scene(spec.objects, sky=spec.sky)
cam = spec.camera(aspect=1.0)
n_iters = diff_fused.calibrate_iters(scene, cam, config, slack=1.1)
segs_ref = None
print(f"m={m} n_iters={n_iters}", flush=True)

params, rest = sb.partition(scene)
plan = bounce.make_plan(scene, config)
stepfn = bounce.as_pallas_vjp(plan, m)
dtype = jnp.float32
n_pix = config.n_pixels


def _timed(fn, arg, label):
    out = jax.block_until_ready(fn(arg))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(arg))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best * 1e3:8.1f} ms"
          + (f"  ({segs_ref / best / 1e6:5.1f}M rays/s-equiv)"
             if segs_ref else ""), flush=True)
    return out


def kernel_only(params):
    s = sb.combine(params, rest)
    pk = bounce.pack(s, cam, plan, dtype)
    z = jnp.zeros(m, dtype)
    one = jnp.ones(m, dtype)
    item = jnp.arange(m, dtype=jnp.int32)
    px = (item % config.nx).astype(dtype)
    py = (item // config.nx % config.ny).astype(dtype)
    fresh = jnp.ones(m, bool)
    alive = jnp.ones(m, bool)
    depth = jnp.zeros(m, jnp.int32)
    state = ((z, z, z), (z, z, one), z, (z, z, z), (one, one, one),
             jnp.zeros((), dtype))
    def body(st, i):
        o, d, t, rad, tp, acc = st
        gitem = i * m + item
        o, d, t, rad, tp, sc = stepfn(plan, pk, gitem, px, py, fresh,
                                      alive, depth, o, d, t, rad, tp)
        acc = acc + rad[0].sum() + rad[1].sum() + rad[2].sum()
        return (o, d, t, rad, tp, acc), None
    (st, _) = jax.lax.scan(body, state, jnp.arange(n_iters))[0][-1], None
    return st


def glue_no_scatter(params):
    # committed glue, flush scatter -> [3] reduction (drops per-pixel
    # placement but keeps every staged value live for AD)
    s = sb.combine(params, rest)
    pk = bounce.pack(s, cam, plan, dtype)
    F = pool_fused.FLUSH_EVERY
    S = (F - 1) // spp + 1
    n_work = n_pix
    item0 = jnp.arange(m, dtype=jnp.int32)
    ys0, xs0 = jnp.divmod(item0 % n_pix, config.nx)
    z = jnp.zeros(m, dtype)
    zi = jnp.zeros(m, jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, m), 0)
    st = dict(o=(z, z, z), d=(z, z, jnp.ones(m, dtype)), time=z,
              rad=(z, z, z), tp=(z, z, z), ax=z, ay=z, az=z,
              item=item0, pass_idx=zi, px=xs0.astype(dtype),
              py=ys0.astype(dtype), fresh=item0 < n_work,
              depth=zi, alive=item0 < n_work,
              next_w=jnp.asarray(m, jnp.int32),
              seq_x=jnp.zeros((S, m), dtype),
              seq_y=jnp.zeros((S, m), dtype),
              seq_z=jnp.zeros((S, m), dtype),
              seq_pix=jnp.zeros((S, m), jnp.int32), seq_k=zi,
              acc=jnp.zeros((3,), dtype))

    def bounce_iter(st):
        gitem = st["pass_idx"] * n_pix + (st["item"] % n_pix)
        o, d, time, rad, tp, scattering = stepfn(
            plan, pk, gitem, st["px"], st["py"], st["fresh"], st["alive"],
            st["depth"], st["o"], st["d"], st["time"], st["rad"], st["tp"])
        path_done = st["alive"] & ~scattering
        ax = st["ax"] + jnp.where(path_done, rad[0], 0.0)
        ay = st["ay"] + jnp.where(path_done, rad[1], 0.0)
        az = st["az"] + jnp.where(path_done, rad[2], 0.0)
        more = path_done & (st["pass_idx"] < spp - 1)
        pixel_done = path_done & (st["pass_idx"] >= spp - 1)
        onehot = (col == st["seq_k"][None, :]) & pixel_done[None, :]
        seq_x = st["seq_x"] + jnp.where(onehot, ax[None, :], 0.0)
        seq_y = st["seq_y"] + jnp.where(onehot, ay[None, :], 0.0)
        seq_z = st["seq_z"] + jnp.where(onehot, az[None, :], 0.0)
        seq_pix = jnp.where(onehot, (st["item"] % n_pix)[None, :],
                            st["seq_pix"])
        seq_k = st["seq_k"] + pixel_done.astype(jnp.int32)
        pd = pixel_done.astype(jnp.int32)
        new_local = st["next_w"] + jnp.cumsum(pd) - pd
        has_work = pixel_done & (new_local < n_work)
        item = jnp.where(has_work, new_local, st["item"])
        ys, xs = jnp.divmod(item % n_pix, config.nx)
        px = jnp.where(has_work, xs.astype(dtype), st["px"])
        py = jnp.where(has_work, ys.astype(dtype), st["py"])
        pass_idx = jnp.where(more, st["pass_idx"] + 1,
                             jnp.where(has_work, 0, st["pass_idx"]))
        ax = jnp.where(has_work, 0.0, ax)
        ay = jnp.where(has_work, 0.0, ay)
        az = jnp.where(has_work, 0.0, az)
        fresh = more | has_work
        depth = jnp.where(scattering, st["depth"] + 1,
                          jnp.where(fresh, 0, st["depth"]))
        alive = scattering | fresh
        next_w = jnp.minimum(st["next_w"] + jnp.sum(pd, dtype=jnp.int32),
                             n_work)
        return dict(o=o, d=d, time=time, rad=rad, tp=tp, ax=ax, ay=ay,
                    az=az, item=item, pass_idx=pass_idx, px=px, py=py,
                    fresh=fresh, depth=depth, alive=alive, next_w=next_w,
                    seq_x=seq_x, seq_y=seq_y, seq_z=seq_z,
                    seq_pix=seq_pix, seq_k=seq_k, acc=st["acc"])

    def block(st, _):
        for _ in range(pool_fused.FLUSH_EVERY):
            st = bounce_iter(st)
        acc = st["acc"] + jnp.stack([st["seq_x"].sum(), st["seq_y"].sum(),
                                     st["seq_z"].sum()])
        st = dict(st, acc=acc,
                  seq_x=jnp.zeros_like(st["seq_x"]),
                  seq_y=jnp.zeros_like(st["seq_y"]),
                  seq_z=jnp.zeros_like(st["seq_z"]),
                  seq_pix=jnp.zeros_like(st["seq_pix"]),
                  seq_k=jnp.zeros_like(st["seq_k"]))
        return st, None
    n_blocks = -(-n_iters // pool_fused.FLUSH_EVERY)
    st, _ = jax.lax.scan(block, st, None, length=n_blocks)
    return st["acc"].sum()


def full(params):
    s = sb.combine(params, rest)
    raw, segs, leftover = diff_fused.render_diff_fused(s, cam, config,
                                                       n_iters)
    return jnp.sum(raw ** 2) / raw.size


# establish segs for rays/s-equivalents
_, segs, lo = jax.jit(lambda p: diff_fused.render_diff_fused(
    sb.combine(p, rest), cam, config, n_iters))(params)
segs_ref = int(segs)
print(f"segs={segs_ref} leftover={int(lo)}", flush=True)

for label, fn in [("kernel", kernel_only), ("glue", glue_no_scatter),
                  ("full", full)]:
    fwd = jax.jit(lambda p, fn=fn: fn(p))
    _timed(fwd, params, f"{label} fwd")
    vg = jax.jit(jax.grad(lambda p, fn=fn: jnp.sum(
        jnp.asarray(fn(p)) ** 2)))
    _timed(vg, params, f"{label} fwd+bwd")

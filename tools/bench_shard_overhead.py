"""On-chip bound for the NON-interconnect half of the scaling story.

No multi-chip slice is reachable from this environment, but two of the
three scaling-loss sources CAN be measured on the one real chip
(VERDICT r4 #8):

  1. shard_map machinery overhead at mesh=1 — the sharded entry points
     (render_pool_sharded, train_step_fused) on a 1-device mesh vs the
     unsharded paths on the same chip.  Any cost of the shard_map
     wrapping, psum insertion, or sharding constraints shows up here;
     interconnect cost is the only thing it cannot see.
  2. the drain-tail occupancy model — per-shard work shrinks as 1/N, so
     the pool's fixed drain tail grows relatively.  The pool reports its
     exact iteration count, so occupancy(n_work) is measurable directly
     by rendering the per-shard work sizes n/1, n/2, ... n/8 on one chip.
     efficiency_model(N) = occupancy(n/N) / occupancy(n/1) bounds the
     tail-induced scaling loss with zero interconnect assumptions.

Run on the TPU:  python tools/bench_shard_overhead.py
Merge the JSON line into BENCH_SCALING.json under "on_chip_overhead".
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scheme_raytrace_tpu import scenes
from scheme_raytrace_tpu import render as R
from scheme_raytrace_tpu.config import RenderConfig
from scheme_raytrace_tpu.integrator import diff_fused
from scheme_raytrace_tpu.parallel import (make_mesh, train_step_fused,
                                          calibrate_iters_sharded)
from scheme_raytrace_tpu.parallel.pool import render_pool_sharded
from scheme_raytrace_tpu.scene import compile_scene
from scheme_raytrace_tpu.scene import build as sb

SIZE, SPP = 512, 16


def _med(fn, n=5):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def main():
    # parts are separately invocable (--fwd / --train / --tail): the
    # sharded training-step compile alone is minutes through the tunnel
    parts = {a for a in sys.argv[1:] if a.startswith("--")} or {
        "--fwd", "--train", "--tail"}
    out = {"workload": f"cornell {SIZE}x{SIZE} spp{SPP} light-sampled, v5e"}
    spec = scenes.cornell_box()
    scene = compile_scene(spec.objects, sky=spec.sky)
    cam = spec.camera(aspect=1.0)
    config = RenderConfig(nx=SIZE, ny=SIZE, spp=SPP, max_depth=100,
                          light_sampling=True, seed=0)
    mesh1 = make_mesh(1)

    # --- forward: sharded(mesh=1) vs unsharded ---------------------------
    st_box = [R.init_state(config)]

    def fwd_unsharded():
        st_box[0], seg, _ = R.render_with_stats(scene, cam, config,
                                                st_box[0])
        float(st_box[0].raw_sum[0, 0, 0])

    def fwd_sharded():
        raw, seg, _ = render_pool_sharded(scene, cam, config, mesh1)
        jax.block_until_ready(raw)
    if "--fwd" in parts:
        t_plain = _med(fwd_unsharded)
        t_shard = _med(fwd_sharded)
        out["fwd_sharded_over_unsharded_time"] = round(t_shard / t_plain, 4)

    # --- training step: train_step_fused(mesh=1) vs single-device -------
    bwd_cfg = config.replace(spp=SPP // 2)
    if "--train" in parts:
        _run_train(scene, cam, bwd_cfg, mesh1, out)
    if "--tail" in parts:
        _run_tail(scene, cam, config, out)
    print(json.dumps(out))


def _run_train(scene, cam, bwd_cfg, mesh1, out):
    n_iters = diff_fused.calibrate_iters(scene, cam, bwd_cfg, slack=1.1)
    params, rest = sb.partition(scene)
    target = jnp.zeros((SIZE, SIZE, 3))

    def loss_fn(p):
        s = sb.combine(p, rest)
        raw, segs, leftover = diff_fused.render_diff_fused(s, cam, bwd_cfg,
                                                           n_iters)
        return jnp.sum(raw ** 2) / raw.size, (segs, leftover)

    step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    def bwd_unsharded():
        (_, (segs, lo)), grads = step(params)
        jax.block_until_ready(grads)
        assert int(lo) == 0
        bwd_unsharded.seg = int(segs)
    t_bplain = _med(bwd_unsharded)

    n_it_sh = calibrate_iters_sharded(scene, cam, bwd_cfg, mesh1, slack=1.1)

    def bwd_sharded():
        _, loss, lo = train_step_fused(params, rest, cam, bwd_cfg, target,
                                       mesh1, n_it_sh, lr=0.0)
        jax.block_until_ready(loss)
        assert int(lo) == 0
    t_bshard = _med(bwd_sharded)
    out["train_sharded_over_unsharded_time"] = round(t_bshard / t_bplain, 4)


def _run_tail(scene, cam, config, out):
    # --- drain-tail occupancy model --------------------------------------
    # occupancy(n_local) from the pool's exact iteration counter at the
    # per-shard frame sizes an N-way row split would produce
    from scheme_raytrace_tpu.integrator import bounce, pool_fused
    occ = {}
    for ndev in (1, 2, 4, 8):
        rows = SIZE // ndev
        c = config.replace(ny=rows)
        stn, seg, iters = R.render_with_stats(scene, cam, c,
                                              R.init_state(c))
        jax.block_until_ready(stn.raw_sum)
        # the pool's ACTUAL lane count for this frame (cap, K, work clamp)
        n_local = c.n_pixels
        cap = max(128, c.resolve_pool_rays() // 128 * 128)
        K = pool_fused.choose_group(n_local, cap,
                                    1, bounce.make_plan(scene, c))
        n_work = n_local // K
        m = max(128, min(cap, ((n_work + 127) // 128) * 128))
        occ[ndev] = int(seg) / (int(iters) * m)
    model = {str(n): round(occ[n] / occ[1], 4) for n in occ}
    out["drain_tail_occupancy"] = {str(n): round(v, 4)
                                   for n, v in occ.items()}
    out["drain_tail_efficiency_model"] = model
    out["note"] = ("mesh=1 on the real chip: ratios ~1.0 mean the "
                   "shard_map/psum machinery itself is free; drain_tail "
                   "model bounds the per-shard-work-shrink loss for an "
                   "N-way row split (interconnect cost is the only "
                   "unmeasured term)")


if __name__ == "__main__":
    main()

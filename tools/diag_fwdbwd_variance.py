"""Diagnose the fwd+bwd bench variance (VERDICT r4 Weak #1).

BENCH_r04 recorded 26.0M rays/s on the same workload where the round-4
confirmation sweep read 43.7M, minutes apart in the same environment —
so the gap is measurement, not build.  Hypotheses probed here, each as a
timing mode over N reps with the full distribution printed:

  chained   — the bench loop as committed: params updated by a host-side
              jax.tree.map between steps, NOT blocked before the timer
              (tiny-op dispatch latency can leak into the timed region).
  blocked   — same, but block_until_ready(params) before starting the
              timer (isolates the step itself).
  fixed     — same params every rep (no chaining at all; relies on the
              loss fetch to defeat any result cache — prints loss to
              verify the values stay identical).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scheme_raytrace_tpu import scenes
from scheme_raytrace_tpu.config import RenderConfig
from scheme_raytrace_tpu.integrator import diff_fused
from scheme_raytrace_tpu.scene import compile_scene
from scheme_raytrace_tpu.scene import build as sb

size, spp, pool = 512, 8, 24 * 1024
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10

config = RenderConfig(nx=size, ny=size, spp=spp, max_depth=100,
                      light_sampling=True, seed=0, pool_rays=pool)
spec = scenes.cornell_box()
scene = compile_scene(spec.objects, sky=spec.sky)
cam = spec.camera(aspect=1.0)
n_iters = diff_fused.calibrate_iters(scene, cam, config, slack=1.1)
params0, rest = sb.partition(scene)


def loss_fn(params):
    s = sb.combine(params, rest)
    raw, segs, leftover = diff_fused.render_diff_fused(s, cam, config,
                                                       n_iters)
    return jnp.sum(raw ** 2) / raw.size, (segs, leftover)


step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
(loss, (segs, leftover)), grads = step(params0)
jax.block_until_ready(grads)
assert int(leftover) == 0
segs = int(segs)
print(f"n_iters={n_iters} segs={segs}", flush=True)

for mode in ("chained", "blocked", "fixed"):
    params, times = params0, []
    for _ in range(reps):
        if mode != "fixed":
            params = jax.tree.map(lambda p, g: p - 1e-6 * g, params, grads)
            if mode == "blocked":
                jax.block_until_ready(params)
        t0 = time.perf_counter()
        (loss, (_, lo)), grads = step(params)
        jax.block_until_ready(grads)
        float(loss)
        times.append(time.perf_counter() - t0)
        assert int(lo) == 0
    times.sort()
    med = times[reps // 2]
    print(f"{mode:8s} min {times[0]*1e3:6.1f}ms ({segs/times[0]/1e6:5.1f}M) "
          f"med {med*1e3:6.1f}ms ({segs/med/1e6:5.1f}M) "
          f"max {times[-1]*1e3:6.1f}ms  all "
          f"{[f'{t*1e3:.0f}' for t in times]}", flush=True)

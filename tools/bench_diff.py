"""Measure fwd+bwd rays/s on TPU: custom-VJP Pallas step vs jnp step.

Run as `python tools/bench_diff.py [size spp pool mode]` from anywhere —
inserts the repo root on sys.path itself (PYTHONPATH breaks the axon
sitecustomize's backend registration in this environment).
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

size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
pool = int(sys.argv[3]) if len(sys.argv) > 3 else 24 * 1024
mode = sys.argv[4] if len(sys.argv) > 4 else "auto"   # auto | jnp

config = RenderConfig(nx=size, ny=size, spp=spp, max_depth=100,
                      light_sampling=True, seed=0, pool_rays=pool,
                      use_pallas=(None if mode == "auto" else False))

spec = scenes.cornell_box()
scene = compile_scene(spec.objects, sky=spec.sky)
cam = spec.camera(aspect=1.0)

t0 = time.perf_counter()
n_iters = diff_fused.calibrate_iters(scene, cam, config)
print(f"calibrated n_iters={n_iters} in {time.perf_counter()-t0:.1f}s",
      flush=True)
params, rest = sb.partition(scene)


def loss_fn(params):
    s = sb.combine(params, rest)
    raw, segs, leftover = diff_fused.render_diff_fused(s, cam, config,
                                                       n_iters)
    return jnp.sum(raw ** 2) / raw.size, (segs, leftover)


step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
t0 = time.perf_counter()
(loss, (segs, leftover)), grads = step(params)
jax.block_until_ready(grads)
print(f"compile+warmup {time.perf_counter()-t0:.1f}s  leftover={int(leftover)}"
      f"  segs={int(segs)}", flush=True)
assert int(leftover) == 0

times = []
for _ in range(5):
    params = jax.tree.map(lambda p, g: p - 1e-6 * g, params, grads)
    # block BEFORE the timer: the tree.map's tiny-op dispatch latency
    # through the tunnel is 10-100ms of noise otherwise (bench.py)
    jax.block_until_ready(params)
    t0 = time.perf_counter()
    (loss, (segs, lo)), grads = step(params)
    jax.block_until_ready(grads)
    times.append(time.perf_counter() - t0)
    assert int(lo) == 0
med = sorted(times)[len(times) // 2]
print(f"mode={mode} size={size} spp={spp} m={pool}: "
      f"{int(segs)/med/1e6:.2f}M rays/s (times {[f'{t:.3f}' for t in times]})")

"""Scaling-efficiency benchmark: sharded pool rays/s at 1 vs N devices.

Runs the Cornell light-sampled workload through render_pool_sharded on a
1-device mesh and on the full device mesh, and reports
efficiency = (rays/s at N) / (N * rays/s at 1).  On the CI host this
exercises the 8-virtual-device CPU mesh (XLA_FLAGS
--xla_force_host_platform_device_count=8); on a real slice the same script
measures ICI scaling (BASELINE north star: >90%).

    python tools/bench_scaling.py [--cpu]

Prints one JSON line; commit the output as BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if "--cpu" in sys.argv:
    # the axon sitecustomize pins jax_platforms via config.update — re-pin
    jax.config.update("jax_platforms", "cpu")

from scheme_raytrace_tpu import scenes  # noqa: E402
from scheme_raytrace_tpu.config import RenderConfig  # noqa: E402
from scheme_raytrace_tpu.parallel.mesh import make_mesh  # noqa: E402
from scheme_raytrace_tpu.parallel.pool import render_pool_sharded  # noqa: E402
from scheme_raytrace_tpu.scene import compile_scene  # noqa: E402


def measure(scene, cam, config, mesh, repeats=3):
    raw, seg, _ = render_pool_sharded(scene, cam, config, mesh)  # compile
    jax.block_until_ready(raw)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        raw, seg, _ = render_pool_sharded(scene, cam, config, mesh)
        jax.block_until_ready(raw)
        best = min(best, time.perf_counter() - t0)
    return int(seg) / best


def main():
    n_dev = jax.device_count()
    is_tpu = jax.devices()[0].platform != "cpu"
    size = 512 if is_tpu else 64
    spp = 16 if is_tpu else 2
    config = RenderConfig(nx=size, ny=size, spp=spp, max_depth=100,
                          light_sampling=True, seed=0,
                          pool_rays=(128 * 1024) if is_tpu else 8192)

    spec = scenes.cornell_box()
    scene = compile_scene(spec.objects, sky=spec.sky)
    cam = spec.camera(aspect=1.0)

    r1 = measure(scene, cam, config, make_mesh(1))
    out = {
        "metric": f"scaling efficiency, Cornell {size}x{size} light-sampled, "
                  f"{jax.devices()[0].platform} x{n_dev}",
        "rays_per_s_1dev": r1,
        "n_devices": n_dev,
    }
    if n_dev > 1:
        rn = measure(scene, cam, config, make_mesh(n_dev))
        out["rays_per_s_ndev"] = rn
        out["value"] = rn / (n_dev * r1)
        out["unit"] = "efficiency"
        out["vs_baseline"] = out["value"] / 0.90   # north star: >90%
    else:
        out["value"] = 1.0
        out["unit"] = "efficiency (single device — trivially 1.0)"
        out["vs_baseline"] = 1.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()

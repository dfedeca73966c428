"""Per-scene forward rays/s on the current backend (fused-path coverage).

Run `python tools/bench_scenes.py [scene ...]`; prints one line per scene
with the executed step impl (pallas vs jnp fallback via the lowering gate).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from scheme_raytrace_tpu import scenes
from scheme_raytrace_tpu import render as R
from scheme_raytrace_tpu.config import RenderConfig
from scheme_raytrace_tpu.integrator import pool_fused
from scheme_raytrace_tpu.scene import compile_scene

DEFAULT = ["cornell", "cornell_smoke", "klein", "cornell_klein",
           "bezier", "cornell_bezier"]


def bench_one(name, size=512, spp=8):
    spec = scenes.SCENES[name]()
    scene = compile_scene(spec.objects, sky=spec.sky)
    cam = spec.camera(aspect=1.0)
    config = RenderConfig(nx=size, ny=size, spp=spp, max_depth=100,
                          light_sampling=scene.n_lights > 0, seed=0,
                          pool_rays=48 * 1024)
    st, seg, iters = R.render_with_stats(scene, cam, config,
                                         R.init_state(config))
    jax.block_until_ready(st.raw_sum)
    impl = pool_fused.LAST_STEP_IMPL.get("forward", "general-pool")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        st, seg, iters = R.render_with_stats(scene, cam, config, st)
        float(st.raw_sum[0, 0, 0])
        times.append(time.perf_counter() - t0)
    med = sorted(times)[1]
    print(f"{name:18s} impl={impl:8s} {int(seg)/med/1e6:8.2f}M rays/s "
          f"({int(seg)} segs, {med*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or DEFAULT
    for n in names:
        pool_fused.LAST_STEP_IMPL.clear()
        try:
            bench_one(n)
        except Exception as e:  # noqa: BLE001
            print(f"{n:18s} FAILED: {type(e).__name__}: {e}", flush=True)

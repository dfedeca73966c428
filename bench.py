"""Headline benchmark: Cornell box 512x512 with mixture-PDF light sampling
(BASELINE config 4), rays/s on the available accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"rays" counts traced path segments (camera rays + every bounce), measured
exactly by the regeneration pool's segment counter — not an estimate.
vs_baseline is against the driver's north-star 1e8 rays/s on a v5e-8,
prorated to the number of chips actually used (1.25e7 rays/s/chip).

The reference has no published numbers to compare against (BASELINE.md):
it is a single-threaded Gauche interpreter, O(minutes) per 200x200 pass.
"""

from __future__ import annotations

import json
import time

import jax

from scheme_raytrace_tpu import scenes
from scheme_raytrace_tpu import render as R
from scheme_raytrace_tpu.config import RenderConfig
from scheme_raytrace_tpu.scene import compile_scene

NORTH_STAR_PER_CHIP = 1e8 / 8  # BASELINE: >1e8 rays/s on a v5e-8 (8 chips)


def main():
    n_chips = jax.device_count()
    is_tpu = jax.devices()[0].platform != "cpu"
    size = 512 if is_tpu else 64          # CPU fallback stays runnable
    spp = 16 if is_tpu else 1
    config = RenderConfig(nx=size, ny=size, spp=spp, max_depth=100,
                          light_sampling=True, seed=0)

    spec = scenes.cornell_box()
    scene = compile_scene(spec.objects, sky=spec.sky)
    cam = spec.camera(aspect=1.0)

    # Warm-up / compile, then the timed run on a fresh accumulator.
    st, seg, iters = R.render_with_stats(scene, cam, config,
                                         R.init_state(config))
    jax.block_until_ready(st.raw_sum)

    t0 = time.perf_counter()
    st, seg, iters = R.render_with_stats(scene, cam, config,
                                         R.init_state(config))
    jax.block_until_ready(st.raw_sum)
    dt = time.perf_counter() - t0

    rays_per_s = int(seg) / dt
    print(json.dumps({
        "metric": "rays/s (path segments, Cornell 512x512 light-sampled)"
                  if is_tpu else "rays/s (path segments, Cornell 64x64, CPU fallback)",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / (NORTH_STAR_PER_CHIP * n_chips),
    }))


if __name__ == "__main__":
    main()

"""TPU lowering gate: fail fast if the Pallas megakernel stops lowering.

Round 2 shipped a kernel that only ever ran in interpret mode and died on
the chip (`cbrt` has no Mosaic lowering; BENCH_r02 rc=1).  This check
lowers the REAL kernel through Mosaic for the flagship configs, so an
unsupported primitive fails a committed check instead of the driver bench.
Run it on a TPU host (it exits 0 with a notice elsewhere):

    python tools/check_tpu_lowering.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from scheme_raytrace_tpu import scenes  # noqa: E402
from scheme_raytrace_tpu.config import RenderConfig  # noqa: E402
from scheme_raytrace_tpu.integrator import bounce  # noqa: E402
from scheme_raytrace_tpu.scene import compile_scene  # noqa: E402


def main():
    if jax.default_backend() != "tpu":
        print("check_tpu_lowering: no TPU backend here — nothing to gate "
              "(the Mosaic lowering only exists for TPU)")
        return 0

    checks = [
        ("cornell_light", scenes.cornell_box,
         RenderConfig(nx=512, ny=512, spp=16, max_depth=100,
                      light_sampling=True)),
        ("cornell_plain", scenes.cornell_box,
         RenderConfig(nx=64, ny=64, spp=4, max_depth=100)),
        ("three_spheres", scenes.three_spheres,
         RenderConfig(nx=64, ny=64, spp=4, max_depth=100)),
        # round-4 fused coverage: media / klein / bezier in-kernel, and the
        # >UNROLL_MAX dynamic-offset prim loop (227 spheres)
        ("cornell_smoke", scenes.cornell_smoke,
         RenderConfig(nx=64, ny=64, spp=4, max_depth=100)),
        ("cornell_klein", scenes.cornell_klein,
         RenderConfig(nx=64, ny=64, spp=4, max_depth=100)),
        ("cornell_bezier", scenes.cornell_bezier,
         RenderConfig(nx=64, ny=64, spp=4, max_depth=100)),
        ("rtow_final", lambda: scenes.random_scene(seed=0),
         RenderConfig(nx=64, ny=64, spp=4, max_depth=100)),
    ]
    failed = []
    for name, scene_fn, config in checks:
        spec = scene_fn()
        scene = compile_scene(spec.objects, sky=spec.sky)
        if not bounce.supported(scene, config):
            print(f"[{name}] not covered by the fused step — skipped")
            continue
        plan = bounce.make_plan(scene, config)
        for m in (128 * 128, 1024 * 128):
            ok = bounce.mosaic_lowers(plan, m, config.dtype)
            print(f"[{name}] m={m}: {'OK' if ok else 'FAILED'}")
            if not ok:
                failed.append((name, m))

    # the reverse-mode (custom-VJP) kernel pair on the bench workload
    spec = scenes.cornell_box()
    scene = compile_scene(spec.objects, sky=spec.sky)
    config = RenderConfig(nx=512, ny=512, spp=8, max_depth=100,
                          light_sampling=True)
    plan = bounce.make_plan(scene, config)
    ok = bounce.mosaic_compiles_vjp(plan, 12 * 1024, config.dtype)
    print(f"[cornell_light vjp] m=12k: {'OK' if ok else 'FAILED'}")
    if not ok:
        failed.append(("cornell_light_vjp", 12 * 1024))

    if failed:
        print(f"FAILED Mosaic compile: {failed}")
        return 1
    print("all Mosaic kernel compiles OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())

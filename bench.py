"""Headline benchmark: Cornell box 512x512 with mixture-PDF light sampling
(BASELINE config 4), rays/s on the available accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.
"rays" counts traced path segments (camera rays + every bounce), measured
exactly by the regeneration pool's segment counter — not an estimate.
vs_baseline is against the driver's north-star 1e8 rays/s on a v5e-8,
prorated to the number of chips actually used (1.25e7 rays/s/chip).
The same line also reports the fwd+bwd (training-step) rays/s, per the
BASELINE "fwd and fwd+bwd" wording, and which step implementation ran
(Pallas megakernel vs jnp fused step).

The reference has no published numbers to compare against (BASELINE.md):
it is a single-threaded Gauche interpreter, O(minutes) per 200x200 pass.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from scheme_raytrace_tpu import scenes
from scheme_raytrace_tpu import render as R
from scheme_raytrace_tpu.config import RenderConfig
from scheme_raytrace_tpu.scene import compile_scene
from scheme_raytrace_tpu.scene import build as sb

NORTH_STAR_PER_CHIP = 1e8 / 8  # BASELINE: >1e8 rays/s on a v5e-8 (8 chips)


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _measure_forward(scene, cam, config, label="fwd"):
    """(rays/s, segments) for the pool forward render, median of 5.

    Timed runs CHAIN the accumulation state (real progressive-render
    usage): every call has different inputs, so no transport/result-cache
    layer can fake the timing, and a device->host fetch inside the timed
    region forces completion.  The chained state is a handful of large
    device arrays already produced by the previous timed call, so (unlike
    the fwd+bwd param chain, see _measure_fwd_bwd) no host-side dispatch
    leaks into the timed region."""
    import numpy as np
    st, seg, iters = R.render_with_stats(scene, cam, config,
                                         R.init_state(config))
    jax.block_until_ready(st.raw_sum)          # compile + warm-up
    assert np.asarray(st.raw_sum).max() > 0, "render produced a black frame"
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        st, seg, iters = R.render_with_stats(scene, cam, config, st)
        float(st.raw_sum[0, 0, 0])
        times.append(time.perf_counter() - t0)
    seg = int(seg)
    med = sorted(times)[len(times) // 2]
    _log(f"bench[{label}]: {config.nx}x{config.ny} spp{config.spp} "
         f"m={config.resolve_pool_rays()} segs={seg} iters={int(iters)} "
         f"times_ms={[round(t * 1e3, 1) for t in times]} "
         f"median={med * 1e3:.1f}ms -> {seg / med / 1e6:.1f}M rays/s")
    return seg / med, seg


def _measure_fwd_bwd(scene, cam, config):
    """Training-step rays/s: value_and_grad of an image loss w.r.t. the
    differentiable scene leaves, through the reverse-mode regeneration pool
    (integrator/diff_fused — same estimator and RNG as the forward pool).
    "rays" counts FORWARD path segments (the same work unit as the forward
    bench); the time includes the full backward pass, so the number is
    directly comparable to the forward line (BASELINE: "fwd and fwd+bwd")."""
    from scheme_raytrace_tpu.integrator import diff_fused

    if not diff_fused.supported(scene, config):
        raise RuntimeError("fwd+bwd bench scene not covered by diff pool")
    # slack 1.1 (vs the library-default 1.25): the bench renders a FIXED
    # seed and only nudges params by 1e-6*grad between timed steps, so the
    # calibrated drain count barely moves; the per-step leftover==0 assert
    # below fails loudly if that ever stops holding.  Measured +1.9M
    # rays/s from the 73 skipped all-dead tail iterations.
    n_iters = diff_fused.calibrate_iters(scene, cam, config, slack=1.1)
    params, rest = sb.partition(scene)

    def loss_fn(params):
        s = sb.combine(params, rest)
        raw, segs, leftover = diff_fused.render_diff_fused(
            s, cam, config, n_iters)
        return jnp.sum(raw ** 2) / raw.size, (segs, leftover)

    step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (loss, (segs, leftover)), grads = step(params)
    jax.block_until_ready(grads)               # compile + warm-up
    assert int(leftover) == 0, "fwd+bwd pool did not drain — raise n_iters"
    times = []
    for _ in range(5):
        # chain params (a real SGD step) so every timed call has new inputs
        params = jax.tree.map(lambda p, g: p - 1e-6 * g, params, grads)
        # BLOCK on the chained params before starting the timer: the
        # tree.map dispatches ~10 tiny device ops, and through the tunnel
        # their dispatch latency is 10-100ms of NOISE that otherwise leaks
        # into the timed region — this unblocked leak is exactly what made
        # BENCH_r04 read 26.0M where the (already-blocked) round-4 sweep
        # read 43.7M on the same build (tools/diag_fwdbwd_variance.py:
        # chained 148-235ms/step vs blocked 138-148ms).
        jax.block_until_ready(params)
        t0 = time.perf_counter()
        (loss, (segs, leftover)), grads = step(params)
        jax.block_until_ready(grads)
        float(loss)
        times.append(time.perf_counter() - t0)
        # timed iterations perturb params — the calibrated n_iters must
        # still drain the queue or the headline silently drops work
        assert int(leftover) == 0, "fwd+bwd pool under-drained mid-bench"
    segs = int(segs)
    med = sorted(times)[len(times) // 2]
    _log(f"bench[fwd+bwd]: {config.nx}x{config.ny} spp{config.spp} "
         f"m={config.resolve_pool_rays(reverse=True)} segs={segs} n_iters={n_iters} "
         f"times_ms={[round(t * 1e3, 1) for t in times]} "
         f"median={med * 1e3:.1f}ms -> {segs / med / 1e6:.1f}M rays/s")
    return segs / med, segs


def main():
    n_chips = jax.device_count()
    is_tpu = jax.devices()[0].platform != "cpu"
    size = 512 if is_tpu else 64          # CPU fallback stays runnable
    spp = 16 if is_tpu else 1
    # pool_rays stays at the AUTO default (None): the library resolves the
    # measured per-direction optima itself (64k forward / 24k reverse,
    # config.resolve_pool_rays) — the bench exercising auto sizing IS the
    # regression check that no hand-set pool is needed (VERDICT r4 #9)
    config = RenderConfig(nx=size, ny=size, spp=spp, max_depth=100,
                          light_sampling=True, seed=0)

    spec = scenes.cornell_box()
    scene = compile_scene(spec.objects, sky=spec.sky)
    cam = spec.camera(aspect=1.0)

    # Forward (pool; Pallas megakernel on TPU via the mosaic_lowers gate).
    # Belt-and-braces: any failure on the default path retries with the jnp
    # fused step so the driver bench always records a number (VERDICT r2 #1).
    from scheme_raytrace_tpu.integrator import pool_fused

    try:
        fwd_rays_s, fwd_segs = _measure_forward(scene, cam, config)
    except Exception as e:  # noqa: BLE001
        _log(f"bench: default path failed ({type(e).__name__}: {e}); "
             "retrying with use_pallas=False")
        config = config.replace(use_pallas=False)
        fwd_rays_s, fwd_segs = _measure_forward(scene, cam, config)
    # what the trace actually picked (a silent gate downgrade inside auto
    # mode is visible here, not masked by "auto")
    step_impl = pool_fused.LAST_STEP_IMPL.get("forward", "unknown")

    # fwd+bwd at full frame, half spp (enough work generations to amortize
    # the drain tail), full 100-bounce cap — the diff pool's occupancy does
    # not depend on it.  Pool size auto-resolves to the reverse-mode
    # optimum (24k; round-5 sweep 24k/32k/40k/48k -> 52/55/51/45M rays/s).
    bwd_cfg = config.replace(spp=max(1, spp // 2))
    try:
        bwd_rays_s, bwd_segs = _measure_fwd_bwd(scene, cam, bwd_cfg)
    except Exception as e:  # noqa: BLE001
        _log(f"bench: fwd+bwd measurement failed ({type(e).__name__}: {e})")
        bwd_rays_s, bwd_segs = None, None
    bwd_impl = pool_fused.LAST_STEP_IMPL.get("reverse", "unknown")

    # Large-frame forward (exercises the row-band flush path on chip)
    big_rays_s = None
    if is_tpu:
        try:
            big_rays_s, _ = _measure_forward(scene, cam,
                                             config.replace(nx=1024, ny=1024))
        except Exception as e:  # noqa: BLE001
            _log(f"bench: 1024^2 measurement failed ({type(e).__name__}: {e})")

    print(json.dumps({
        "metric": "rays/s (path segments, Cornell 512x512 light-sampled)"
                  if is_tpu else "rays/s (path segments, Cornell 64x64, CPU fallback)",
        "value": fwd_rays_s,
        "unit": "rays/s",
        "vs_baseline": fwd_rays_s / (NORTH_STAR_PER_CHIP * n_chips),
        "fwd_bwd_rays_per_s": bwd_rays_s,
        "fwd_bwd_workload": f"{bwd_cfg.nx}x{bwd_cfg.ny} spp{bwd_cfg.spp} "
                            f"depth{bwd_cfg.max_depth}",
        "step_impl": step_impl,
        "fwd_bwd_step_impl": bwd_impl,
        "fwd_1024_rays_per_s": big_rays_s,
        "n_chips": n_chips,
    }))


if __name__ == "__main__":
    main()

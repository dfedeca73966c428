"""Interpret-mode equivalence for the experimental pool variants
(docs/PERF_NOTES.md "experiments that did NOT beat the simple pool"):
`integrator/persist.py`, `integrator/pool_packed.py` (+ their kernels
`bounce.as_pallas_packed` / the persistent grid kernel).  They are kept
in-tree as measured perf experiments; these tests keep them from rotting
(ADVICE r3 medium): same scene, same RNG streams, same estimator — the
image must match the routed FIFO pool to scatter-reorder noise and the
traced segment count must be exact.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scheme_raytrace_tpu import scenes
from scheme_raytrace_tpu.config import RenderConfig
from scheme_raytrace_tpu.integrator import pool_fused, pool_packed, persist
from scheme_raytrace_tpu.scene import compile_scene

CFG = RenderConfig(nx=8, ny=8, spp=2, max_depth=6, light_sampling=True,
                   pool_rays=128, use_pallas=False)


def _setup():
    spec = scenes.cornell_box()
    scene = compile_scene(spec.objects, sky=spec.sky)
    cam = spec.camera(aspect=1.0)
    raw0 = jnp.zeros((CFG.n_pixels, 3), jnp.float32)
    ref, seg_ref, _ = pool_fused.render_pool_fused(scene, cam, CFG, raw0, 0)
    return scene, cam, raw0, np.asarray(ref), int(seg_ref)


def _check(raw, segs, ref, seg_ref):
    raw = np.asarray(raw)
    assert np.isfinite(raw).all()
    assert int(segs) == seg_ref
    # same paths, same per-path radiance; only the scatter-add grouping
    # differs -> f32 reorder noise
    np.testing.assert_allclose(raw, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_packed_pool_matches_fused():
    # slow tier: ~37s of interpret-mode kernel compile on this host
    scene, cam, raw0, ref, seg_ref = _setup()
    raw, segs, _ = pool_packed.render_pool_packed(scene, cam, CFG, raw0, 0,
                                                  interpret=True)
    _check(raw, segs, ref, seg_ref)


@pytest.mark.slow
def test_persistent_pool_matches_fused():
    # slow tier: the persistent kernel compiles the whole T-iteration
    # bounce loop as one interpret-mode pallas_call
    scene, cam, raw0, ref, seg_ref = _setup()
    raw, segs, _ = persist.render_pool_persistent(scene, cam, CFG, raw0, 0,
                                                  interpret=True)
    _check(raw, segs, ref, seg_ref)

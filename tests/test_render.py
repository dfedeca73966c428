"""Render pipeline tests: accumulation, display transform, PPM writer,
checkpoint/resume (main.scm:428-491, :123-124, :439-450; SURVEY §5.4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from scheme_raytrace_tpu import render as R
from scheme_raytrace_tpu import scenes
from scheme_raytrace_tpu.config import RenderConfig
from scheme_raytrace_tpu.scene import compile_scene

CFG = RenderConfig(nx=8, ny=8, spp=2, max_depth=4)


def _tiny():
    spec = scenes.test_scene()
    return compile_scene(spec.objects, sky=spec.sky), spec.camera(aspect=1.0)


def test_render_accumulates_passes():
    scene, cam = _tiny()
    st = R.render(scene, cam, CFG, R.init_state(CFG))
    assert int(st.sample_count) == 2
    assert st.raw_sum.shape == (8, 8, 3)
    assert bool(jnp.all(jnp.isfinite(st.raw_sum)))
    assert bool(jnp.all(st.raw_sum >= 0.0))


def test_render_deterministic():
    scene, cam = _tiny()
    a = R.render(scene, cam, CFG, R.init_state(CFG))
    b = R.render(scene, cam, CFG, R.init_state(CFG))
    np.testing.assert_array_equal(np.asarray(a.raw_sum), np.asarray(b.raw_sum))


def test_resume_matches_one_shot():
    # 2 passes then 2 more == 4 passes in one go (pass keys derive from
    # sample_count, so resumption is bit-exact — SURVEY §5.4).
    scene, cam = _tiny()
    one = R.render(scene, cam, CFG.replace(spp=4), R.init_state(CFG))
    st = R.render(scene, cam, CFG, R.init_state(CFG))
    st = R.render(scene, cam, CFG, st)
    np.testing.assert_allclose(np.asarray(st.raw_sum), np.asarray(one.raw_sum),
                               rtol=1e-6)


def test_to_u8_display_transform():
    # main.scm:461-465: floor(255.99 * min(1, sqrt(mean)))
    mean = np.array([[[0.0, 0.25, 4.0]]])
    out = R.to_u8(mean)
    np.testing.assert_array_equal(out[0, 0], [0, int(255.99 * 0.5), 255])
    assert out.dtype == np.uint8


def test_ppm_roundtrip(tmp_path):
    mean = np.random.default_rng(0).uniform(0, 1, (4, 6, 3))
    path = str(tmp_path / "t.ppm")
    R.write_ppm(path, mean)
    with open(path) as f:
        toks = f.read().split()
    assert toks[0] == "P3"
    assert (int(toks[1]), int(toks[2]), int(toks[3])) == (6, 4, 255)
    vals = np.array(toks[4:], np.uint8).reshape(4, 6, 3)
    # writer flips rows (main.scm:445)
    np.testing.assert_array_equal(vals, R.to_u8(mean)[::-1])


def test_save_load_state(tmp_path):
    scene, cam = _tiny()
    st = R.render(scene, cam, CFG, R.init_state(CFG))
    path = str(tmp_path / "ckpt.npz")
    R.save_state(path, st, seed=0)
    st2 = R.load_state(path)
    np.testing.assert_array_equal(np.asarray(st.raw_sum), np.asarray(st2.raw_sum))
    assert int(st2.sample_count) == int(st.sample_count)


def test_render_image_mean():
    scene, cam = _tiny()
    mean, st = R.render_image(scene, cam, CFG)
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(st.raw_sum) / 2.0, rtol=1e-6)

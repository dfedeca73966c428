"""On-chip A/B: grads through the custom-VJP Pallas diff pool vs jnp step."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from scheme_raytrace_tpu import scenes
from scheme_raytrace_tpu.config import RenderConfig
from scheme_raytrace_tpu.integrator import diff_fused
from scheme_raytrace_tpu.scene import compile_scene, build as sb

spec = scenes.cornell_box()
scene = compile_scene(spec.objects, sky=spec.sky)
cam = spec.camera(aspect=1.0)
params, rest = sb.partition(scene)

def grads_for(mode):
    config = RenderConfig(nx=64, ny=64, spp=2, max_depth=24,
                          light_sampling=True, seed=0, pool_rays=4096,
                          use_pallas=(None if mode == "auto" else False))
    n_iters = diff_fused.calibrate_iters(scene, cam, config)
    def loss_fn(p):
        s = sb.combine(p, rest)
        raw, _, leftover = diff_fused.render_diff_fused(s, cam, config, n_iters)
        return jnp.sum(raw ** 2) / raw.size, leftover
    (l, leftover), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert int(leftover) == 0
    return float(l), g

l_a, g_a = grads_for("auto")
l_j, g_j = grads_for("jnp")
print("loss", l_a, l_j, "rel", abs(l_a - l_j) / abs(l_j))
worst = 0.0
for k in g_a:
    a, j = np.asarray(g_a[k]), np.asarray(g_j[k])
    scale = max(np.abs(j).max(), 1e-8)
    rel = np.abs(a - j).max() / scale
    worst = max(worst, rel)
    print(f"{k:16s} max|g_jnp|={np.abs(j).max():.3e}  rel_diff={rel:.2e}")
print("worst rel", worst)
assert worst < 5e-3, worst
print("OK: TPU custom-VJP grads match jnp-step grads")

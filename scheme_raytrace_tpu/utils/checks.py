"""Numerical-hygiene checks (SURVEY §5.2): checkify-instrumented rendering.

The reference has no sanitizers at all (§5.2: "None"); JAX's functional
purity removes data races by construction, and this module adds the
float-error tier: a render whose every intermediate is NaN/Inf-checked by
`jax.experimental.checkify`, for debugging scenes or kernels that produce
non-finite radiance.  This is a debug path (checkify instruments every op
— expect ~2x slowdown); production rendering stays uninstrumented and is
guarded by the NaN-regression tests instead (tests/test_grads.py).
"""

from __future__ import annotations

import jax
from jax.experimental import checkify

from .. import render as R


def checked_render_image(scene, cam, config):
    """render_image with float checks; raises on the first NaN/Inf.

    Uses the differentiable (scan) path: checkify cannot thread errors
    through the pool's data-dependent while_loop.
    """
    cfg = config.replace(differentiable=True)

    def run(scene, cam):
        mean, _ = R.render_image(scene, cam, cfg)
        return mean

    checked = checkify.checkify(run, errors=checkify.float_checks)
    err, mean = jax.jit(checked)(scene, cam)
    err.throw()
    return mean

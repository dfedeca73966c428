"""Probe Mosaic/Pallas-TPU support for the ops the bounce megakernel needs:
uint32 PCG rounds, int32 div/mod by constants, transcendentals, scalar VMEM
reads, bool selects.  Run on TPU; falls back to interpret mode with --cpu.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERP = "--cpu" in sys.argv


def kernel(pack_ref, item_ref, out_ref):
    item = item_ref[:]                        # (8,128) int32
    # int div/mod by constants
    npx = 200 * 200
    pix = item % npx
    ys = pix // 200
    xs = pix - ys * 200
    # uint32 PCG round
    a = item.astype(jnp.uint32)
    b = (ys + 1).astype(jnp.uint32)
    a = a * jnp.uint32(1664525) + jnp.uint32(1013904223)
    b = b * jnp.uint32(1664525) + jnp.uint32(1013904223)
    a = a + b * a
    a = a ^ (a >> 16)
    u = jax.lax.bitcast_convert_type(a >> jnp.uint32(8),
                                     jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24))
    # scalar VMEM reads
    k = pack_ref[0, 3]
    # transcendentals
    s = jnp.sin(u * 6.28) + jnp.cos(u) + jnp.sqrt(u + 1.0)
    c = jnp.power(u + 0.5, 1.0 / 3.0)
    # bool select
    m = u < 0.5
    out_ref[:] = jnp.where(m, s * k + c, xs.astype(jnp.float32))


def main():
    pack = jnp.arange(16, dtype=jnp.float32).reshape(1, 16)
    item = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(pack, item)
    print("ok:", jnp.isfinite(out).all(), out.ravel()[:4])


if __name__ == "__main__":
    main()

"""Measure framebuffer-flush strategies for the regeneration pool on TPU.

All variants run K times inside one jitted fori_loop (true device time).
Tested:
  (a) scatter-add of M rows into [n_pix,3]          (current pool.py flush)
  (a2) scatter-add of M/8 rows                      (cost vs index count)
  (a3) scatter-add, indices_are_sorted+unique hints
  (b) dense one-hot flush into a [M,C,3] per-lane sequence buffer
  (c) dense elementwise add into [M,3] (lane-aligned framebuffer)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K = 50


def timed_loop(stage, init, n=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, stage, x)

    jax.block_until_ready(run(init))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    m = 128 * 1024
    n_pix = 512 * 512
    pix = (jnp.arange(m, dtype=jnp.int32) * 97) % n_pix
    pix_sorted = jnp.sort(pix)
    mask = jnp.arange(m) % 7 == 0
    raw = jnp.zeros((n_pix, 3), jnp.float32)

    def a(i, raw):
        vals = jnp.where(mask[:, None], 1.0 + i, 0.0)
        return raw.at[pix].add(jnp.broadcast_to(vals, (m, 3)))

    m8 = m // 8

    def a2(i, raw):
        vals = jnp.full((m8, 3), 1.0 + i)
        return raw.at[pix[:m8]].add(vals)

    def a3(i, raw):
        vals = jnp.full((m, 3), 1.0 + i)
        return raw.at[pix_sorted].add(vals, indices_are_sorted=True,
                                      unique_indices=False)

    C = 32
    seq = jnp.zeros((m, C, 3), jnp.float32)
    k_col = (jnp.arange(m, dtype=jnp.int32) * 13) % C

    def b(i, seq):
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (m, C), 1)
                  == k_col[:, None]).astype(jnp.float32)
        vals = jnp.where(mask, 1.0 + i, 0.0)
        return seq + onehot[:, :, None] * vals[:, None, None]

    lane_fb = jnp.zeros((m, 3), jnp.float32)

    def c(i, fb):
        vals = jnp.where(mask[:, None], 1.0 + i, 0.0)
        return fb + jnp.broadcast_to(vals, (m, 3))

    C8 = 8
    seq8 = jnp.zeros((m, C8, 3), jnp.float32)
    k8 = k_col % C8

    def b8(i, seq):
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (m, C8), 1)
                  == k8[:, None]).astype(jnp.float32)
        vals = jnp.where(mask, 1.0 + i, 0.0)
        return seq + onehot[:, :, None] * vals[:, None, None]

    for name, fn, init in [
        ("(a) scatter-add M rows", a, raw),
        ("(a2) scatter-add M/8 rows", a2, raw),
        ("(a3) scatter-add sorted", a3, raw),
        ("(b) one-hot seq C=32", b, seq),
        ("(b8) one-hot seq C=8", b8, seq8),
        ("(c) dense lane add", c, lane_fb),
    ]:
        dt = timed_loop(fn, init)
        print(f"{name:>28}: {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()

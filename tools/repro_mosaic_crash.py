"""Minimal repros for the Mosaic tpu_compile_helper subprocess crash class
(commit d8a570f; seen again on the klein megakernel).  Each case lowers
cleanly and either compiles (ok) or kills the compiler subprocess —
run on a TPU backend: `python tools/repro_mosaic_crash.py [case ...]`.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (64, 128)


def build(body):
    def kernel(x_ref, o_ref):
        o_ref[:] = body(x_ref[:])
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32))


def case_fori(x):
    return jax.lax.fori_loop(0, 100, lambda i, a: a * 1.0001 + 0.1, x)


def case_nested_fori(x):
    def outer(i, a):
        return jax.lax.fori_loop(0, 10, lambda j, b: b * 1.0001 + 0.1, a)
    return jax.lax.fori_loop(0, 100, outer, x)


def case_fori_carry5(x):
    # multi-array carry, like the klein march state
    def outer(i, st):
        a, b, c, d, e = st
        def inner(j, st2):
            a, b, c, d, e = st2
            m = (a * a + b * b) < 4.0
            a = jnp.where(m, a * 1.1 + 0.1, a)
            b = jnp.where(m, b * 0.9, b)
            d = jnp.where(m, d * 1.01, d)
            return a, b, c, d, e & m
        return jax.lax.fori_loop(0, 10, inner, st)
    a, b, c, d, e = x, x + 1, x + 2, x + 3, x > 0
    a, b, c, d, e = jax.lax.fori_loop(0, 100, outer, (a, b, c, d, e))
    return a + b + c + d + e.astype(jnp.float32)


def case_jvp_fori(x):
    def f(t):
        return jax.lax.fori_loop(0, 10, lambda j, b: b * t + 0.1, t)
    y, dy = jax.jvp(f, (x,), (jnp.ones_like(x),))
    return y + dy




def case_nested_float_carry(x):
    def outer(i, st):
        a, b = st
        def inner(j, st2):
            a, b = st2
            m = (a * a) < 4.0
            return jnp.where(m, a * 1.1, a), jnp.where(m, b * 0.9, b)
        return jax.lax.fori_loop(0, 10, inner, st)
    a, b = jax.lax.fori_loop(0, 100, outer, (x, x + 1))
    return a + b


def case_single_bool_carry(x):
    def inner(j, st2):
        a, e = st2
        m = (a * a) < 4.0
        return jnp.where(m, a * 1.1 + 0.1, a), e & m
    a, e = jax.lax.fori_loop(0, 10, inner, (x, x > 0))
    return a + e.astype(jnp.float32)


def case_nested_bool_carry(x):
    def outer(i, st):
        a, e = st
        def inner(j, st2):
            a, e = st2
            m = (a * a) < 4.0
            return jnp.where(m, a * 1.1 + 0.1, a), e & m
        return jax.lax.fori_loop(0, 10, inner, st)
    a, e = jax.lax.fori_loop(0, 100, outer, (x, x > 0))
    return a + e.astype(jnp.float32)


def case_bool_carry_as_i32(x):
    # the workaround: carry the mask as int32, compare at the use sites
    def inner(j, st2):
        a, e = st2
        m = (a * a) < 4.0
        return jnp.where(m, a * 1.1 + 0.1, a), (e != 0) & m
    def inner_i(j, st2):
        a, e = inner(j, (st2[0], st2[1]))
        return a, e.astype(jnp.int32)
    a, e = jax.lax.fori_loop(0, 10, inner_i, (x, (x > 0).astype(jnp.int32)))
    return a + e.astype(jnp.float32)


def case_while_any(x):
    # early-exit march pattern: while_loop with a cross-lane any() cond
    def cond(st):
        a, done_i, k = st
        return (k < 100) & jnp.any(done_i == 0)
    def body(st):
        a, done_i, k = st
        a2 = a * 1.3 + 0.1
        done_i = done_i | (a2 > 100.0).astype(jnp.int32)
        return jnp.where(done_i != 0, a, a2), done_i, k + 1
    a, _, _ = jax.lax.while_loop(
        cond, body, (x, jnp.zeros_like(x, jnp.int32), jnp.int32(0)))
    return a


CASES = {n[5:]: f for n, f in list(globals().items())
         if n.startswith("case_")}

if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    for n in names:
        try:
            jax.jit(build(CASES[n])).lower(
                jax.ShapeDtypeStruct(SHAPE, jnp.float32)).compile()
            print(f"{n:16s} ok", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{n:16s} CRASH: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}", flush=True)

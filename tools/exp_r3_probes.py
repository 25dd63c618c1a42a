"""Bisect the pt_fused Mosaic compile failure: AOT-compile tiny kernels
each exercising ONE feature the fused PT kernel uses that the (known
good) packet kernel doesn't. Compile-only (.lower().compile()), no chip
execution needed.

Run: nohup python tools/exp_r3_probes.py > tools/logs/exp_r3_probes.out 2> tools/logs/exp_r3_probes.log &
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES = {}


def log(m):
    print(m, file=sys.stderr, flush=True)


def emit(k, v):
    RES[k] = v
    log(f"{k}: {v}")
    print(json.dumps(RES), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def try_compile(tag, fn, *args):
        try:
            jax.jit(fn).lower(*args).compile()
            emit(tag, "ok")
        except Exception as e:
            emit(tag, f"{type(e).__name__}: {e}"[:160])

    B, LN = 64, 128
    vec = jnp.zeros((B, LN), jnp.float32)

    # a) 2D f32 SMEM array, dynamic scalar row reads in a fori loop
    def ka(tab_ref, x_ref, o_ref):
        def body(i, acc):
            return acc + tab_ref[i, 3]
        o_ref[:] = x_ref[:] + jax.lax.fori_loop(0, 32, body, 0.0)

    try_compile(
        "smem2d",
        lambda t, x: pl.pallas_call(
            ka,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((B, LN), lambda: (0, 0))],
            out_specs=pl.BlockSpec((B, LN), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, LN), jnp.float32),
        )(t, x),
        jnp.zeros((32, 17), jnp.float32), vec)

    # b) 4D blockspec with grid
    def kb(x_ref, o_ref):
        o_ref[0, 0] = x_ref[0, 0] * 2.0

    try_compile(
        "blk4d",
        lambda x: pl.pallas_call(
            kb,
            grid=(4,),
            in_specs=[pl.BlockSpec((6, 1, B, LN), lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec((3, 1, B, LN), lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((3, 4, B, LN), jnp.float32),
        )(x),
        jnp.zeros((6, 4, B, LN), jnp.float32))

    # c) bool vector carries in fori_loop
    def kc(x_ref, o_ref):
        m0 = x_ref[:] > 0.0

        def body(i, c):
            m, s = c
            return m & (s < 5.0), s + 1.0

        m, s = jax.lax.fori_loop(0, 8, body, (m0, jnp.zeros((B, LN), jnp.float32)))
        o_ref[:] = jnp.where(m, s, 0.0)

    try_compile(
        "boolcarry",
        lambda x: pl.pallas_call(
            kc,
            in_specs=[pl.BlockSpec((B, LN), lambda: (0, 0))],
            out_specs=pl.BlockSpec((B, LN), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, LN), jnp.float32),
        )(x),
        vec)

    # d) int32 vector hash (multiply + logical shifts + iota)
    def kd(x_ref, o_ref):
        i1 = jax.lax.broadcasted_iota(jnp.int32, (B, LN), 0)
        h = i1 * np.int32(0x7FEB352D)
        h = h ^ jax.lax.shift_right_logical(h, np.int32(15))
        h = h * np.int32(-2073352565)
        u = jax.lax.shift_right_logical(h, np.int32(8)).astype(jnp.float32)
        o_ref[:] = x_ref[:] + u * (1.0 / (1 << 24))

    try_compile(
        "i32hash",
        lambda x: pl.pallas_call(
            kd,
            in_specs=[pl.BlockSpec((B, LN), lambda: (0, 0))],
            out_specs=pl.BlockSpec((B, LN), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, LN), jnp.float32),
        )(x),
        vec)

    # e) sin/cos vectors
    def ke(x_ref, o_ref):
        o_ref[:] = jnp.sin(x_ref[:]) + jnp.cos(x_ref[:] * 2.0)

    try_compile(
        "sincos",
        lambda x: pl.pallas_call(
            ke,
            in_specs=[pl.BlockSpec((B, LN), lambda: (0, 0))],
            out_specs=pl.BlockSpec((B, LN), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, LN), jnp.float32),
        )(x),
        vec)

    # f) nested fori with a 14-array carry
    def kf(x_ref, o_ref):
        x = x_ref[:]
        st = tuple(x + i for i in range(12)) + (x > 0, x > 1)

        def inner(i, c):
            ars = list(c[:12])
            ars[0] = ars[0] + jnp.where(c[12], ars[1], ars[2])
            return tuple(ars) + (c[12] & c[13], c[13])

        def outer(s, c):
            return jax.lax.fori_loop(0, 8, inner, c)

        st = jax.lax.fori_loop(0, 4, outer, st)
        o_ref[:] = st[0]

    try_compile(
        "nestcarry",
        lambda x: pl.pallas_call(
            kf,
            in_specs=[pl.BlockSpec((B, LN), lambda: (0, 0))],
            out_specs=pl.BlockSpec((B, LN), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, LN), jnp.float32),
        )(x),
        vec)

    # g) 1D int32 SMEM scalar + program_id arithmetic
    def kg(m_ref, x_ref, o_ref):
        pid = pl.program_id(0)
        o_ref[:] = x_ref[:] + (m_ref[0] + pid).astype(jnp.float32)

    try_compile(
        "smem1d_pid",
        lambda m, x: pl.pallas_call(
            kg,
            grid=(2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, B, LN), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, B, LN), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, B, LN), jnp.float32),
        )(m, x),
        jnp.zeros((1,), jnp.int32), jnp.zeros((2, B, LN), jnp.float32))


if __name__ == "__main__":
    main()

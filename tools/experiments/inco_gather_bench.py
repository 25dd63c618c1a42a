"""Grounding microbench for the per-ray persistent-kernel NEGATIVE
(VERDICT r3 #6): measure the primitive rates the arithmetic bound in
incoherent_persistent_kernel.md uses, instead of assuming them.

Measures on the real TPU:
  1. xla_row_gather_mrows_s  — jnp.take of (rows, 128) f32 rows at
     uniformly random indices (the wavefront engine's per-step cost
     shape: every ray fetches its own node/leaf row).
  2. pallas_dyn_fetch_mfetch_s — scalar-indexed dynamic VMEM row fetch
     rate inside a Pallas kernel loop (the packet kernel's node-fetch
     primitive: ONE row per vector->scalar sync, shared by the whole
     packet).

Run: nohup python tools/experiments/inco_gather_bench.py > \
    tools/logs/inco_gather_bench.out 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

OUT = {}


def emit(k, v):
    OUT[k] = v
    print(json.dumps(OUT), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # ---- 1. XLA random row gather (wavefront engine cost shape) ----
    n_rows = 137_697  # the 1M-tri scene's leaf-row count
    table = jnp.asarray(np.random.rand(n_rows, 128).astype(np.float32))
    R = 8_388_608
    idx = jnp.asarray(np.random.randint(0, n_rows, R, dtype=np.int32))

    @jax.jit
    def gather(t, i):
        return jnp.take(t, i, axis=0).sum()

    float(gather(table, idx))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(gather(table, idx))
        ts.append(time.perf_counter() - t0)
    emit("xla_row_gather_mrows_s", round(R / min(ts) / 1e6, 1))

    # ---- 2. Pallas scalar-indexed dynamic row fetch loop ----
    N_FETCH = 65_536

    def kern(tab_ref, o_ref):
        def body(i, acc):
            # data-dependent next index (defeats prefetch speculation,
            # like a real traversal's stack pop)
            # Knuth multiplier as its int32 two's-complement (x64 test
            # mode parses bare >int32 literals as int64)
            j = (acc.astype(jnp.int32) + i * jnp.int32(-1640531527)) % n_rows
            row = tab_ref[pl.ds(j, 1), :]
            return acc + row[0, 0]

        o_ref[0, 0] = jax.lax.fori_loop(0, N_FETCH, body, jnp.float32(0))

    run = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    runj = jax.jit(lambda t: run(t))
    small = table[:65536]  # 32 MB, VMEM-resident

    def go():
        return float(np.asarray(runj(small))[0, 0])

    go()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        go()
        ts.append(time.perf_counter() - t0)
    emit("pallas_dyn_fetch_mfetch_s", round(N_FETCH / min(ts) / 1e6, 3))
    emit("pallas_dyn_fetch_ns_each", round(min(ts) / N_FETCH * 1e9))


if __name__ == "__main__":
    main()

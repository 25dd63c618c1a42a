"""Round-3: device-build (collapse_lbvh_device) stage profile at 10M
tris — the warm build is 38.6s on TPU and the VERDICT 10M target is
build+collapse < 15 s. Times each pipeline stage as its own jit with a
scalar readback (stage boundaries force materialization, so the sum
overestimates the fused pipeline — ratios are what matter).

Run: nohup python tools/exp_r3_devprof.py > tools/logs/exp_r3_devprof.out 2> tools/logs/exp_r3_devprof.log &
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


RES = {}


def timeit(tag, fn, n=2):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    log(f"{tag}: {min(ts)*1e3:.0f} ms {[round(x*1e3) for x in ts]}")
    RES[tag] = round(min(ts) * 1e3)
    print(json.dumps(RES), flush=True)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu.build.device_collapse import collapse_lbvh_device, _phase_a, _phase_b, _next_pow2
    from nanort_tpu.build.lbvh import MAX_DEPTH, _karras_topology, morton_codes
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene

    n_tris = int(os.environ.get("EXP_TRIS", 10_000_000))
    v, f = make_subdivided_sphere_scene(n_tris)
    v = jax.device_put(jnp.asarray(v))
    f = jax.device_put(jnp.asarray(f))
    n = int(f.shape[0])
    max_leaf, K = 9, 4
    log(f"{n} tris")

    # end-to-end reference
    def full():
        s = collapse_lbvh_device(v, f, width=16, max_leaf=max_leaf)
        return float(np.asarray(s.nodes[0, 0]))

    timeit("full_build_ms", full)

    i32 = jnp.int32

    @jax.jit
    def stage_morton(vertices, faces):
        v0 = jnp.take(vertices, faces[:, 0], axis=0)
        v1 = jnp.take(vertices, faces[:, 1], axis=0)
        v2 = jnp.take(vertices, faces[:, 2], axis=0)
        prim_lo = jnp.minimum(jnp.minimum(v0, v1), v2)
        prim_hi = jnp.maximum(jnp.maximum(v0, v1), v2)
        centers = 0.5 * (prim_lo + prim_hi)
        scene_lo = prim_lo.min(axis=0)
        scene_hi = prim_hi.max(axis=0)
        codes = morton_codes(centers, scene_lo, scene_hi)
        order = jnp.argsort(codes).astype(i32)
        codes_s = jnp.take(codes, order)
        return prim_lo, prim_hi, codes_s, order, scene_lo

    timeit("a1_morton_sort_ms",
           lambda: float(stage_morton(v, f)[2].max()))
    prim_lo, prim_hi, codes, order, scene_lo = stage_morton(v, f)
    jax.block_until_ready(codes)

    @functools.partial(jax.jit, static_argnames=("nn",))
    def stage_topo(codes, nn):
        first, last, split = _karras_topology(codes, nn)
        return first, last, split

    timeit("a2_topology_ms",
           lambda: int(stage_topo(codes, n)[0].min()))
    first, last, split = stage_topo(codes, n)
    jax.block_until_ready(first)

    @jax.jit
    def stage_rangebbox(prim_lo, prim_hi, order, first, split, last):
        sorted_lo = jnp.take(prim_lo, order, axis=0)
        sorted_hi = jnp.take(prim_hi, order, axis=0)
        l_size = split - first + 1
        r_size = last - split

        def range_bbox(a, count):
            lo = jnp.take(sorted_lo, a, axis=0)
            hi = jnp.take(sorted_hi, a, axis=0)
            for k in range(1, max_leaf):
                valid = k < count
                g = jnp.minimum(a + k, n - 1)
                lo = jnp.where(valid[:, None],
                               jnp.minimum(lo, jnp.take(sorted_lo, g, axis=0)),
                               lo)
                hi = jnp.where(valid[:, None],
                               jnp.maximum(hi, jnp.take(sorted_hi, g, axis=0)),
                               hi)
            return lo, hi

        lf = range_bbox(first, l_size)
        rf = range_bbox(split + 1, r_size)
        return lf[0], lf[1], rf[0], rf[1], sorted_lo, sorted_hi

    timeit("a3_rangebbox_ms",
           lambda: float(stage_rangebbox(
               prim_lo, prim_hi, order, first, split, last)[0].min()))
    lf_lo, lf_hi, rf_lo, rf_hi, sorted_lo, sorted_hi = stage_rangebbox(
        prim_lo, prim_hi, order, first, split, last)
    jax.block_until_ready(lf_lo)

    EMPTY_BIG = 1.0e30

    @jax.jit
    def stage_refit(first, last, split, lf_lo, lf_hi, rf_lo, rf_hi):
        ni = n - 1
        size = last - first + 1
        l_size = split - first + 1
        r_size = last - split
        l_leaf = l_size <= max_leaf
        r_leaf = r_size <= max_leaf
        l_child, r_child = split, split + 1
        node_lo = jnp.full((ni, 3), EMPTY_BIG, jnp.float32)
        node_hi = jnp.full((ni, 3), -EMPTY_BIG, jnp.float32)

        def refit(st):
            lo, hi, _, it = st
            llo = jnp.where(l_leaf[:, None], lf_lo, jnp.take(lo, l_child, axis=0))
            lhi = jnp.where(l_leaf[:, None], lf_hi, jnp.take(hi, l_child, axis=0))
            rlo = jnp.where(r_leaf[:, None], rf_lo, jnp.take(lo, r_child, axis=0))
            rhi = jnp.where(r_leaf[:, None], rf_hi, jnp.take(hi, r_child, axis=0))
            nlo = jnp.minimum(llo, rlo)
            nhi = jnp.maximum(lhi, rhi)
            done = jnp.all(nlo == lo) & jnp.all(nhi == hi)
            return nlo, nhi, done, it + 1

        node_lo, node_hi, _, iters = jax.lax.while_loop(
            lambda st: (~st[2]) & (st[3] < MAX_DEPTH), refit,
            (node_lo, node_hi, jnp.bool_(False), jnp.int32(0)))
        return node_lo, node_hi, iters

    def run_refit():
        o = stage_refit(first, last, split, lf_lo, lf_hi, rf_lo, rf_hi)
        return float(o[0].min()), int(o[2])

    timeit("a4_refit_ms", run_refit)
    _, _, iters = stage_refit(first, last, split, lf_lo, lf_hi, rf_lo, rf_hi)
    log(f"refit fixpoint iters: {int(iters)}")
    RES["refit_iters"] = int(iters)

    # rest of phase A (parents, depth, wide ids, banks, record sorts)
    def run_phase_a():
        out = _phase_a(v, f, n=n, max_leaf=max_leaf, K=K)
        return int(out[9])

    timeit("a_all_ms", run_phase_a)

    out = _phase_a(v, f, n=n, max_leaf=max_leaf, K=K)
    (order_a, sp, s_meta, s_cnt, s_a, s_leaf, leaf_rank, sboxes,
     node_axis, nw, n_rows, wide_depth) = out
    jax.block_until_ready(sp)
    nw_pad = _next_pow2(int(nw) + 1)
    nrows_pad = _next_pow2(max(int(n_rows), 1))

    def run_phase_b():
        nodes, leafs, _ = _phase_b(
            v, f, order_a, sp, s_meta, s_cnt, s_a, s_leaf, leaf_rank,
            sboxes, node_axis, n=n, width=16, max_leaf=max_leaf,
            nw_pad=nw_pad, nrows_pad=nrows_pad)
        return float(nodes[0, 0])

    timeit("b_all_ms", run_phase_b)


if __name__ == "__main__":
    main()

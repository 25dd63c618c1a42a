"""Round-3: incoherent-engine attack (VERDICT item 7 — tracked row is
0.78 Mrays/s; done = >=2 Mrays/s or a recorded negative result).

Phases (4M fully-random rays, 1M-tri scene, T=512 treelets):
  1. current binned engine end-to-end (reference point this session)
  2. stage-wise timing of the binned pipeline (sort / klists / round-1
     pair sweep broken into order/fill/kernel/merge) to find the
     non-kernel overhead the VERDICT suspects
  3. sorted-small-packet alternative: plain Morton sort + packet kernel
     at sub in {4, 8} (no binning stages at all)

Run: nohup python tools/exp_r3_inco.py > tools/logs/exp_r3_inco.out 2> tools/logs/exp_r3_inco.log &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh, make_rays
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.treelet import (
        _treelet_klists,
        make_treelets,
        traverse_bvh8_binned,
    )
    from nanort_tpu.traverse.ray_sort import ray_sort_keys, traverse_bvh8_sorted

    results = {}
    v, f = make_subdivided_sphere_scene(1_000_000)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8))
    s8 = collapse_bvh8(bvh, v, f)
    tl, s8b = make_treelets(s8, 512)
    put = lambda s: s._replace(
        nodes=jax.device_put(jnp.asarray(s.nodes)),
        leafs=jax.device_put(jnp.asarray(s.leafs)))
    s8 = put(s8)
    s8b = put(s8b)

    R = 4_194_304
    rng = np.random.default_rng(11)
    lo, hi = np.asarray(bvh.bmin[0]), np.asarray(bvh.bmax[0])
    org = rng.uniform(lo, hi, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(org), jnp.asarray(d.astype(np.float32)))

    def timeit(tag, fn, n=2):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        log(f"{tag}: {min(ts)*1e3:.0f} ms {[round(x*1e3) for x in ts]}")
        results[tag] = round(min(ts) * 1e3)
        print(json.dumps(results), flush=True)
        return min(ts)

    # ---- phase 1: current engine end-to-end ----
    def run_binned():
        h = traverse_bvh8_binned(s8b, rays, treelets=tl, K=8)
        return float(h.t.min())

    t = timeit("binned_now_ms", run_binned)
    results["binned_now_mrays"] = round(R / t / 1e6, 3)
    log(f"binned now: {R/t/1e6:.3f} Mrays/s")

    # ---- phase 2: stage timing ----
    flat = rays
    lo_t = jnp.min(jnp.asarray(tl.bmin), axis=0)
    hi_t = jnp.max(jnp.asarray(tl.bmax), axis=0)

    sort_fn = jax.jit(lambda fl: jnp.argsort(ray_sort_keys(fl, lo_t, hi_t)))
    timeit("stage_sortkeys_argsort_ms", lambda: float(sort_fn(flat).min()))

    sorder = sort_fn(flat)
    sflat = jax.tree_util.tree_map(
        lambda x: jnp.take(x, sorder, axis=0), flat)
    jax.block_until_ready(sflat.org)

    bmin_d, bmax_d = jnp.asarray(tl.bmin), jnp.asarray(tl.bmax)

    def run_klists():
        te, td, ne = _treelet_klists(
            sflat.org, sflat.dir, sflat.min_t, sflat.max_t,
            bmin_d, bmax_d, 8)
        return float(te.min()), float(ne.max())

    timeit("stage_klists_ms", run_klists)

    # round-1 sweep internals
    from nanort_tpu.traverse.treelet import (
        _pair_fill,
        _pair_merge,
        _pair_order,
        _next_bucket,
    )
    from nanort_tpu.core.options import BVHTraceOptions, INVALID_PRIM_ID
    from nanort_tpu.core.ray import Hits
    from nanort_tpu.traverse.pallas_packet import traverse_bvh8

    te, td, ne = _treelet_klists(
        sflat.org, sflat.dir, sflat.min_t, sflat.max_t, bmin_d, bmax_d, 8)
    jax.block_until_ready(te)
    T = tl.count
    sub = 8
    packet = sub * 128
    best = Hits(
        t=sflat.max_t, u=jnp.zeros_like(sflat.max_t),
        v=jnp.zeros_like(sflat.max_t),
        prim_id=jnp.full(sflat.max_t.shape, INVALID_PRIM_ID, jnp.uint32))
    td1, te1 = td[:, 0:1], te[:, 0:1]

    def run_order():
        o, k, c, na, npad = _pair_order(td1, te1, best.t, T, 1, packet)
        return int(na), int(npad)

    timeit("stage_r1_order_ms", run_order)
    order, key_s, counts, n_act, n_padded = _pair_order(
        td1, te1, best.t, T, 1, packet)
    n_slots = _next_bucket(int(n_padded) + packet, packet)
    j_cap = min(R, n_slots)
    order_j = jax.lax.slice(order, (0,), (j_cap,))
    key_j = jax.lax.slice(key_s, (0,), (j_cap,))
    comps = jnp.concatenate(
        [jnp.concatenate(
            [sflat.org, sflat.dir, sflat.min_t[:, None],
             jnp.full((R, 1), -1.0, jnp.float32)], axis=1),
         jnp.asarray([[0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0, -1.0]],
                     jnp.float32)], axis=0)
    log(f"r1: n_act={int(n_act)} n_slots={n_slots}")

    def run_fill():
        sc, pt, ss = _pair_fill(
            order_j, key_j, counts, comps, best.t, T, 1, packet, n_slots)
        return float(sc[0].min())

    timeit("stage_r1_fill_ms", run_fill)

    slot_comps, pkt_tid, slot_src = _pair_fill(
        order_j, key_j, counts, comps, best.t, T, 1, packet, n_slots)
    jax.block_until_ready(slot_comps[0])
    roots_dev = jnp.asarray(tl.roots)
    pkt_root = jnp.where(
        pkt_tid >= 0, jnp.take(roots_dev, jnp.maximum(pkt_tid, 0)), 0)
    ox, oy, oz, dx, dy, dz, mint, maxt = slot_comps
    from nanort_tpu.core.ray import Rays
    brays = Rays(org=jnp.stack([ox, oy, oz], axis=-1),
                 dir=jnp.stack([dx, dy, dz], axis=-1),
                 min_t=mint, max_t=maxt)
    jax.block_until_ready(brays.org)

    def run_kernel():
        h = traverse_bvh8(s8b, brays, BVHTraceOptions(), sub=sub,
                          packet_roots=pkt_root)
        return float(h.t.min())

    timeit("stage_r1_kernel_ms", run_kernel)
    h1 = traverse_bvh8(s8b, brays, BVHTraceOptions(), sub=sub,
                       packet_roots=pkt_root)
    jax.block_until_ready(h1.t)

    def run_merge():
        m = _pair_merge(best, h1.t, h1.u, h1.v, h1.prim_id, slot_src)
        return float(m.t.min())

    timeit("stage_r1_merge_ms", run_merge)

    # ---- phase 3: sorted small packets, no binning ----
    want = None
    for sub_s in (8, 4):
        def run_sorted():
            h = traverse_bvh8_sorted(s8, rays, sub=sub_s)
            return float(h.t.min())

        try:
            t = timeit(f"sorted_sub{sub_s}_ms", run_sorted)
            results[f"sorted_sub{sub_s}_mrays"] = round(R / t / 1e6, 3)
            log(f"sorted sub={sub_s}: {R/t/1e6:.3f} Mrays/s")
        except Exception as e:  # noqa: BLE001
            log(f"sorted sub={sub_s} FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")
            results[f"sorted_sub{sub_s}_mrays"] = None
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

"""Round-3: incoherent engine after rowpack (packed slot fill/merge) —
A/B octant_major packing and K/chunk knobs. 4M fully-random rays vs the
1M-tri sphere scene, treelet pair sweep.

Run: nohup python tools/exp_r3_inco2.py > tools/logs/exp_r3_inco2.out 2> tools/logs/exp_r3_inco2.log &
"""
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

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh, make_rays
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.treelet import make_treelets, traverse_bvh8_binned

    v, f = make_subdivided_sphere_scene(1_000_000)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8))
    s8 = collapse_bvh8(bvh, v, f)
    s8 = s8._replace(nodes=jnp.asarray(s8.nodes), leafs=jnp.asarray(s8.leafs))

    R = 4_000_000
    rng = np.random.default_rng(11)
    org = rng.uniform(-1.4, 1.4, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(org), jnp.asarray(d))
    jax.block_until_ready(rays.org)

    tl, s8a = make_treelets(s8, 512)
    s8a = s8a._replace(nodes=jnp.asarray(s8a.nodes))
    ref_hits = {}

    def run(tag, **kw):
        def go():
            h = traverse_bvh8_binned(s8a, rays, treelets=tl, **kw)
            float(h.t.min())
            return h
        h = go()
        ref_hits[tag] = np.asarray(h.prim_id)
        t = timeit(tag + "_ms", lambda: go())
        RES[tag + "_mrays"] = round(R / t / 1e6, 3)
        print(json.dumps(RES), flush=True)

    run("base")                     # rowpack + iter-klists vs r2's 0.78
    run("octant", octant_major=True)
    run("octant_sub4", octant_major=True, sub=4)
    run("octant_sub16", octant_major=True, sub=16)

    # parity across variants (ties at equal t are legal; just count)
    base = ref_hits["base"]
    for k, vH in ref_hits.items():
        if k != "base":
            RES[f"prim_mismatch_{k}"] = int((vH != base).sum())
    print(json.dumps(RES), flush=True)

    # ---- klists stage alone: iter vs top_k (fresh jit wrappers so the
    # module flag is re-captured) ----
    from nanort_tpu.traverse import treelet as tm

    bmin = jnp.asarray(tl.bmin)
    bmax = jnp.asarray(tl.bmax)
    for mode, flag in (("iter", True), ("topk", False)):
        tm._KLISTS_ITER = flag

        @jax.jit
        def kl(o, dd, mn, mx):
            return tm._treelet_klists_chunk(o, dd, mn, mx, bmin, bmax, 8)

        CH = 1 << 20
        o4, d4 = rays.org[:CH], rays.dir[:CH]
        mn, mx = rays.min_t[:CH], rays.max_t[:CH]

        def go():
            return float(kl(o4, d4, mn, mx)[0].min())

        t = timeit(f"klists_{mode}_1M_ms", lambda: go())
    tm._KLISTS_ITER = True


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(f"FATAL {type(e).__name__}: {e}")
        raise

"""Round-3: renderer-overhead fixes, measured on the real TPU.

What changed: (1) sort_rays/unsort ride ONE packed (R, C) row
gather/scatter instead of per-field scalar gathers (core/rowpack);
(2) tiny scenes (<= 512 tris) trace brute-force inside the jit —
config B's Cornell is 32 tris, so every bounce had been paying ~1 s of
permutation plumbing for ~10 ms of intersection work; (3) AO rays from
missed primaries are born dead (max_t < min_t) and cluster via the
sort key's dead bit.

Measures: config A (AO 512^2+8spp, 16K tris), the standalone sorted
bounce trace on the config-A scene (was ~352 ms), trace_paths megabatch
marginals (was flat ~1.1 s/bounce), config B full (target <= 10 s).

Run: nohup python tools/exp_r3_rend.py > tools/logs/exp_r3_rend.out 2> tools/logs/exp_r3_rend.log &
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
    from nanort_tpu.io.procedural import (
        make_cornell_box,
        make_cornell_pt_scene,
        make_uv_sphere,
        merge_meshes,
    )
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.objrender import render_ao
    from nanort_tpu.models.path_tracer import (
        make_pt_scene,
        render_path_traced,
        trace_paths,
    )
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import detect_specialization
    from nanort_tpu.traverse.ray_sort import traverse_bvh8_sorted

    # ---- config A scene ----
    opt8 = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(64, 128, 0.6))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh, opt8)
    s8 = collapse_bvh8(bvh, v, f)
    s8 = s8._replace(nodes=jnp.asarray(s8.nodes), leafs=jnp.asarray(s8.leafs))
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=512, height=512, fov=45.0)
    rays = pinhole_rays(cam)
    key = jax.random.PRNGKey(7)
    spec_a = detect_specialization(rays)
    log(f"configA scene {len(f)} tris")

    def run_a():
        aovs, hits = render_ao(bvh, mesh, rays, key, n_samples=8,
                               max_leaf=8, scene8=s8, specialize=spec_a)
        return float(np.asarray(aovs["ao"].min()))

    timeit("configA_full_ms", run_a, n=3)

    # standalone sorted bounce trace (2.1M random-hemisphere rays)
    rng = np.random.default_rng(5)
    RB = 512 * 512 * 8
    dd = rng.normal(size=(RB, 3))
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    borg = jnp.asarray(rng.uniform(-1.5, 1.5, (RB, 3)).astype(np.float32))
    brays = make_rays(borg, jnp.asarray(dd.astype(np.float32)))
    jax.block_until_ready(brays.org)

    def run_bounce():
        h = traverse_bvh8_sorted(s8, brays, occlusion=True)
        return float(h.t.min())

    t = timeit("configA_bounce_sorted_ms", run_bounce)
    RES["configA_bounce_mrays"] = round(RB / t / 1e6, 1)

    # ---- config B: megabatch marginals + full ----
    sv, sf, mids, mats = make_cornell_pt_scene(2.0)
    pts = make_pt_scene(sv, sf, mids, mats, engine="pallas")
    prays = pinhole_rays(cam)
    org = prays.org.reshape(-1, 3)
    d = prays.dir.reshape(-1, 3)
    R = org.shape[0]
    n = 25
    org_all = jnp.broadcast_to(org[None], (n, R, 3)).reshape(-1, 3)
    dir_all = jnp.broadcast_to(d[None], (n, R, 3)).reshape(-1, 3)
    jax.block_until_ready(org_all)
    pkey = jax.random.PRNGKey(3)

    prev = prev_mb = None
    for mb in (1, 10):
        def run():
            c = trace_paths(pts, org_all, dir_all, pkey, max_bounces=mb)
            return float(c.min())

        t = timeit(f"pt_brute_b{mb}_ms", run)
        if prev is not None:
            log(f"  marginal per bounce: {(t-prev)/(mb-prev_mb)*1e3:.0f} ms")
            RES["pt_marginal_bounce_ms"] = round((t - prev) / (mb - prev_mb) * 1e3)
        prev, prev_mb = t, mb

    def run_full():
        img = render_path_traced(pts, prays, pkey, spp=100, max_bounces=10,
                                 spp_batch=25)
        return float(np.asarray(img.mean()))

    run_full()  # warm (same shapes as b10 but recompile-safe)
    t0 = time.perf_counter()
    s_val = run_full()
    dur = time.perf_counter() - t0
    RES["configB_s"] = round(dur, 2)
    RES["configB_msamples_per_s"] = round(512 * 512 * 100 / dur / 1e6, 2)
    log(f"configB 512^2 x100spp: {dur:.2f}s mean={s_val:.4f}")
    print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    main()

"""Round-3 experiment: PACKED single-row BVH16 nodes on real TPU.

Phase 1 (correctness): packed-16 records vs the brute-force oracle on
cornell+sphere (bit compare; ties at equal t legal).
Phase 2 (perf, 1M tris, 8192^2): wt16/woop16 at sub 32/64 + pop_n 1/2
against the BVH8 anchors. Both 16-wide tables fit VMEM (nodes ~27 MB).

Run: nohup python tools/exp_r3_p16.py > tools/logs/exp_r3_p16.out 2> tools/logs/exp_r3_p16.log &
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

    from nanort_tpu import (
        BVHBuildOptions,
        build_triangle_bvh,
        brute_force_traverse,
        make_rays,
    )
    from nanort_tpu.build.bvh8 import collapse_bvh8, collapse_bvh16
    from nanort_tpu.io.procedural import (
        make_cornell_box,
        make_subdivided_sphere_scene,
        make_uv_sphere,
        merge_meshes,
    )
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    # ---- phase 1: oracle compare on a small scene ----
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(16, 32, 0.5))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9)
    )
    s16 = collapse_bvh16(bvh, v, f, woop=True)
    rng = np.random.default_rng(5)
    n = 3000
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-0.8, 0.8, (n, 3))
    d = tgt - org
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(org, d.astype(np.float32))
    t0 = time.perf_counter()
    got = jax.tree_util.tree_map(np.asarray, traverse_bvh8(s16, rays))
    log(f"phase1 first kernel {time.perf_counter()-t0:.0f}s")
    want = jax.tree_util.tree_map(np.asarray, brute_force_traverse(mesh, rays))
    gh = got.prim_id != 0xFFFFFFFF
    wh = want.prim_id != 0xFFFFFFFF
    m = gh & wh
    same = got.prim_id[m] == want.prim_id[m]
    ok = (
        bool((gh == wh).all())
        and bool(np.array_equal(got.t[m][same], want.t[m][same]))
        and bool(np.array_equal(got.u[m][same], want.u[m][same]))
        and ((~same).sum() == 0
             or bool(np.array_equal(got.t[m][~same], want.t[m][~same])))
    )
    log(f"wt16 vs oracle: hits {int(gh.sum())}/{n} ok={ok} "
        f"prim_same {int(same.sum())}/{int(m.sum())}")
    # woop sanity (approximate records: hit mask + close t)
    gw = jax.tree_util.tree_map(
        np.asarray, traverse_bvh8(s16, rays, intersector="woop")
    )
    gwh = gw.prim_id != 0xFFFFFFFF
    wok = bool((gwh == wh).mean() > 0.999) and bool(
        np.allclose(gw.t[gwh & wh], want.t[gwh & wh], rtol=1e-4)
    )
    log(f"woop16 vs oracle: hits {int(gwh.sum())}/{n} ok~={wok}")
    if not ok or not wok:
        print(json.dumps({"parity": False}))
        log("PARITY FAILED — aborting perf phase")
        return

    # ---- phase 2: perf ----
    n_tris = int(os.environ.get("EXP_TRIS", 1_000_000))
    res = int(os.environ.get("EXP_RES", 8192))
    reps = int(os.environ.get("EXP_REPS", 3))
    v, f = make_subdivided_sphere_scene(n_tris)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9)
    )
    t0 = time.perf_counter()
    s8 = collapse_bvh8(bvh, v, f, woop=True)
    log(f"collapse8 {time.perf_counter()-t0:.0f}s: {s8.num_nodes} nodes "
        f"{s8.num_leaf_rows} rows")
    t0 = time.perf_counter()
    s16 = collapse_bvh16(bvh, v, f, woop=True)
    log(f"collapse16 {time.perf_counter()-t0:.0f}s: {s16.num_nodes} nodes "
        f"{s16.num_leaf_rows} rows depth {s16.depth}")

    def put(s):
        return s._replace(
            nodes=jax.device_put(jnp.asarray(s.nodes)),
            leafs=jax.device_put(jnp.asarray(s.leafs)),
            leafs_woop=jax.device_put(jnp.asarray(s.leafs_woop)),
        )

    s8, s16 = put(s8), put(s16)
    cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                  width=res, height=res, fov=60.0)
    rays = pinhole_rays(cam)
    n_rays = res * res
    results = {}
    spec = None
    ref_hits = {}
    for name, sc, sub, kw in (
        ("wt8_sub32", s8, 32, {}),
        ("wt16_sub32", s16, 32, {}),
        ("wt16_sub64", s16, 64, {}),
        ("wt16_sub32_pop1", s16, 32, dict(pop_n=1)),
        ("woop8_sub64", s8, 64, dict(intersector="woop")),
        ("woop16_sub64", s16, 64, dict(intersector="woop")),
        ("woop16_sub32", s16, 32, dict(intersector="woop")),
        ("woop16_sub64_pop1", s16, 64, dict(intersector="woop", pop_n=1)),
    ):
        tile_h = 128
        tile_w = (8 * sub * 32) // tile_h
        rays_t, _ = tile_image_rays(rays, tile_h, tile_w)
        if spec is None:
            spec = detect_specialization(rays_t)
            log(f"spec {spec}")
        kw = dict(kw)
        if kw.get("intersector") == "woop":
            kw["specialize"] = (None, spec[1])
        else:
            kw["specialize"] = spec
        try:
            t0 = time.perf_counter()
            h = traverse_bvh8(sc, rays_t, sub=sub, **kw)
            _ = float(h.t.min())
            log(f"=== {name} first {time.perf_counter()-t0:.0f}s")
            # record cross-check vs the BVH8 engine of the same kind
            eng = (kw.get("intersector", "watertight"), sub)
            if eng in ref_hits:
                b = ref_hits[eng]
                bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
                pd = int((h.prim_id != b.prim_id).sum())
                td = int((bc(h.t) != bc(b.t)).sum())
                log(f"  vs bvh8 {eng}: prim diffs {pd} t bit-diffs {td}"
                    f" / {n_rays}")
            else:
                ref_hits[eng] = h
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                h = traverse_bvh8(sc, rays_t, sub=sub, **kw)
                _ = float(h.t.min())
                ts.append(time.perf_counter() - t0)
            mr = n_rays / min(ts) / 1e6
            results[name] = round(mr, 1)
            log(f"  {name}: {mr:.1f} Mrays/s ({[round(x*1e3) for x in ts]})")
        except Exception as e:  # noqa: BLE001
            log(f"  {name} FAILED {type(e).__name__}: {str(e)[:200]}")
            results[name] = None
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Round-3 experiment: watertight leaf-test micro-opts (min/max edge fold,
det_ok guard removal) — bit-parity + same-process perf vs Woop anchors.

Phase 1 (correctness): packet kernel vs the stack-engine oracle
  a) cornell+sphere, 3000 random rays — prim/t/u/v bit compare
  b) axis-aligned quad grid with rays through EXACT lattice edges — the
     zero-edge class that drives the in-kernel Dekker retrace
Phase 2 (perf, 1M tris, 8192^2 primaries):
  woop_sub32 / woop_sub64 anchors, wt_sub32 / wt_sub64
  historical same-process ratio wt_sub32/woop_sub32 = 132.4/157.4 = 0.841

Run: nohup python tools/exp_r3_wt2.py > tools/logs/exp_r3_wt2.out 2> tools/logs/exp_r3_wt2.log &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def bitcmp(name, got, want):
    gh = got.prim_id != 0xFFFFFFFF
    wh = want.prim_id != 0xFFFFFFFF
    hit_ok = bool((gh == wh).all())
    m = gh & wh
    same = got.prim_id[m] == want.prim_id[m]
    t_ok = bool(np.array_equal(got.t[m][same], want.t[m][same]))
    uv_ok = bool(
        np.array_equal(got.u[m][same], want.u[m][same])
        and np.array_equal(got.v[m][same], want.v[m][same])
    )
    ties_ok = True
    if (~same).any():
        ties_ok = bool(
            np.allclose(got.t[m][~same], want.t[m][~same], rtol=0, atol=0)
        )
    log(
        f"  {name}: hits {int(gh.sum())}/{gh.size} hit_ok={hit_ok} "
        f"prim_same={int(same.sum())}/{int(m.sum())} t_bit={t_ok} "
        f"uv_bit={uv_ok} tie_t_eq={ties_ok}"
    )
    return hit_ok and t_ok and uv_ok and ties_ok


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import (
        BVHBuildOptions,
        build_triangle_bvh,
        brute_force_traverse,
        make_rays,
    )
    from nanort_tpu.build.bvh8 import collapse_bvh8
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

    ok = True

    # ---- phase 1a: random-ray oracle compare ----
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(16, 32, 0.5))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    )
    s8 = collapse_bvh8(bvh, v, f)
    rng = np.random.default_rng(5)
    n = 3000
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-0.8, 0.8, (n, 3))
    d = tgt - org
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(org, d.astype(np.float32))
    t0 = time.perf_counter()
    got = jax.tree_util.tree_map(np.asarray, traverse_bvh8(s8, rays))
    log(f"phase1a first kernel {time.perf_counter()-t0:.0f}s")
    want = jax.tree_util.tree_map(np.asarray, brute_force_traverse(mesh, rays))
    ok &= bitcmp("random3000", got, want)

    # ---- phase 1b: exact-edge lattice ----
    # unit quad grid in z=0 plane; orthographic-like rays shot straight
    # down THROUGH the lattice lines: every ray on a shared edge /vertex
    G = 32
    xs, ys = np.meshgrid(np.arange(G + 1, dtype=np.float32),
                         np.arange(G + 1, dtype=np.float32))
    verts = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3)
    qi = (ys[:-1, :-1] * 0 + np.arange(G)[None, :]
          + (G + 1) * np.arange(G)[:, None]).astype(np.int32)
    i0 = qi.reshape(-1)
    faces = np.stack(
        [np.concatenate([i0, i0]),
         np.concatenate([i0 + 1, i0 + G + 2]),
         np.concatenate([i0 + G + 2, i0 + G + 1])], -1
    ).astype(np.int32)
    gmesh = TriangleMesh(vertices=jnp.asarray(verts), faces=jnp.asarray(faces))
    gbvh, _ = build_triangle_bvh(
        gmesh, BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    )
    g8 = collapse_bvh8(gbvh, verts, faces)
    # rays exactly on lattice lines (integer x, fractional y), exactly on
    # shared hypotenuses (equal fractional parts: the diagonal runs
    # (x,y)->(x+1,y+1)), and exactly on shared vertices (integer both)
    ex, eyv = np.meshgrid(np.arange(1, G, dtype=np.float32),
                          np.arange(1, G, dtype=np.float32) + 0.25)
    o1 = np.stack([ex, eyv, np.full_like(ex, 3.0)], -1).reshape(-1, 3)
    dg = np.arange(1, G, dtype=np.float32)
    o2 = np.stack([dg + 0.5, np.full_like(dg, 3.5), np.full_like(dg, 3.0)], -1)
    o3 = np.stack([dg, dg, np.full_like(dg, 3.0)], -1)
    orgs = np.concatenate([o1, o2, o3]).astype(np.float32)
    dirs = np.zeros_like(orgs)
    dirs[:, 2] = -1.0
    erays = make_rays(orgs, dirs)
    egot = jax.tree_util.tree_map(np.asarray, traverse_bvh8(g8, erays))
    ewant = jax.tree_util.tree_map(
        np.asarray, brute_force_traverse(gmesh, erays)
    )
    ok &= bitcmp("edge_lattice", egot, ewant)
    if not ok:
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
    s8 = collapse_bvh8(bvh, v, f, woop=True)
    s8 = s8._replace(
        nodes=jax.device_put(jnp.asarray(s8.nodes)),
        leafs=jax.device_put(jnp.asarray(s8.leafs)),
        leafs_woop=jax.device_put(jnp.asarray(s8.leafs_woop)),
    )
    log(f"scene {s8.num_nodes} nodes {s8.num_leaf_rows} rows")
    cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                  width=res, height=res, fov=60.0)
    rays = pinhole_rays(cam)
    n_rays = res * res
    results = {}
    spec = None
    for name, sub, kw in (
        ("woop_sub32", 32, dict(intersector="woop")),
        ("woop_sub64", 64, dict(intersector="woop")),
        ("wt_sub32", 32, {}),
        ("wt_sub64", 64, {}),
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
            h = traverse_bvh8(s8, rays_t, sub=sub, **kw)
            _ = float(h.t.min())
            log(f"=== {name} first {time.perf_counter()-t0:.0f}s")
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                h = traverse_bvh8(s8, rays_t, sub=sub, **kw)
                _ = float(h.t.min())
                ts.append(time.perf_counter() - t0)
            mr = n_rays / min(ts) / 1e6
            results[name] = round(mr, 1)
            log(f"  {name}: {mr:.1f} Mrays/s ({[round(x*1e3) for x in ts]})")
        except Exception as e:  # noqa: BLE001
            log(f"  {name} FAILED {type(e).__name__}: {str(e)[:200]}")
            results[name] = None

    if results.get("woop_sub32") and results.get("wt_sub32"):
        results["ratio_wt_woop_sub32"] = round(
            results["wt_sub32"] / results["woop_sub32"], 3
        )
        results["hist_ratio"] = 0.841
    print(json.dumps(results))


if __name__ == "__main__":
    main()

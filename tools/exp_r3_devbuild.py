"""Round-3: fully device-side scene build (collapse_lbvh_device) on the
real TPU — correctness vs the oracle, then build-time + traversal
throughput at 1M and 10M tris (VERDICT item 2: build+collapse < 15 s
at 10M; the host pipeline is ~30 s SAH + ~143 s collapse).

Run: nohup python tools/exp_r3_devbuild.py > tools/logs/exp_r3_devbuild.out 2> tools/logs/exp_r3_devbuild.log &
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

    from nanort_tpu import brute_force_traverse, make_rays
    from nanort_tpu.build.device_collapse import collapse_lbvh_device
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

    results = {}

    # ---- phase 1: record parity vs oracle on a small scene ----
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(16, 32, 0.5))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    s = collapse_lbvh_device(v, f, width=16, max_leaf=9)
    log(f"small: {s.num_nodes} nodes {s.num_leaf_rows} rows depth {s.depth}")
    rng = np.random.default_rng(5)
    n = 3000
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-0.8, 0.8, (n, 3))
    d = tgt - org
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(org, d.astype(np.float32))
    got = jax.tree_util.tree_map(np.asarray, traverse_bvh8(s, rays))
    want = jax.tree_util.tree_map(np.asarray, brute_force_traverse(mesh, rays))
    gh = got.prim_id != 0xFFFFFFFF
    wh = want.prim_id != 0xFFFFFFFF
    m = gh & wh
    same = got.prim_id[m] == want.prim_id[m]
    ok = (
        bool((gh == wh).all())
        and bool(np.array_equal(got.t[m][same], want.t[m][same]))
        and ((~same).sum() == 0
             or bool(np.array_equal(got.t[m][~same], want.t[m][~same])))
    )
    log(f"devbuild16 vs oracle: hits {int(gh.sum())}/{n} ok={ok} "
        f"prim_same {int(same.sum())}/{int(m.sum())}")
    results["parity"] = bool(ok)
    print(json.dumps(results), flush=True)
    if not ok:
        log("PARITY FAILED — aborting perf phases")
        return

    # ---- phase 2/3: device build time + traversal throughput ----
    for tag, n_tris, res, sub, tile in (
        ("1m", 1_000_000, 8192, 32, (128, 64)),
        ("10m", 10_000_000, 8192, 16, (128, 32)),
    ):
        v, f = make_subdivided_sphere_scene(n_tris)
        v = jax.device_put(jnp.asarray(v))
        f = jax.device_put(jnp.asarray(f))
        t0 = time.perf_counter()
        s = collapse_lbvh_device(v, f, width=16, max_leaf=9)
        float(np.asarray(s.nodes[0, 0]))  # force completion
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        s = collapse_lbvh_device(v, f, width=16, max_leaf=9)
        float(np.asarray(s.nodes[0, 0]))
        warm = time.perf_counter() - t0
        log(f"{tag}: device build cold {cold:.1f}s warm {warm:.2f}s — "
            f"{s.num_nodes} nodes {s.num_leaf_rows} rows depth {s.depth} "
            f"(tables {s.nodes.shape} / {s.leafs.shape})")
        results[f"{tag}_build_cold_s"] = round(cold, 2)
        results[f"{tag}_build_warm_s"] = round(warm, 2)

        cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                      width=res, height=res, fov=60.0)
        rays_t, _ = tile_image_rays(pinhole_rays(cam), *tile)
        spec = detect_specialization(rays_t)
        try:
            t0 = time.perf_counter()
            h = traverse_bvh8(s, rays_t, sub=sub, specialize=spec)
            _ = float(h.t.min())
            log(f"{tag}: first traverse {time.perf_counter()-t0:.0f}s")
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                h = traverse_bvh8(s, rays_t, sub=sub, specialize=spec)
                _ = float(h.t.min())
                ts.append(time.perf_counter() - t0)
            mr = res * res / min(ts) / 1e6
            results[f"{tag}_mrays"] = round(mr, 1)
            log(f"{tag}: {mr:.1f} Mrays/s ({[round(x*1e3) for x in ts]})")
        except Exception as e:  # noqa: BLE001
            log(f"{tag} traverse FAILED {type(e).__name__}: {str(e)[:200]}")
            results[f"{tag}_mrays"] = None
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

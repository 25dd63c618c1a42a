"""Round-3: watertight BVH16 with 10-tri leaf rows (wt rows hold 10,
woop 9 — the headline engine is watertight, so leaf=10 trades one more
leaf test per drain for ~10% fewer drains). A/B vs the leaf=9 anchor in
ONE process (ambient drift makes cross-process numbers untrustworthy).

Run: nohup python tools/exp_r3_leaf10.py > tools/logs/exp_r3_leaf10.out 2> tools/logs/exp_r3_leaf10.log &
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

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh16
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    res = 8192
    v, f = make_subdivided_sphere_scene(1_000_000)
    mesh = TriangleMesh(vertices=v, faces=f)
    cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                  width=res, height=res, fov=60.0)
    rays = pinhole_rays(cam)
    rays_t, _ = tile_image_rays(rays, 128, 64)
    spec = detect_specialization(rays_t)
    log(f"spec {spec}")
    results = {}
    ref = None
    for name, leaf in (("wt16_l9", 9), ("wt16_l10", 10)):
        bvh, _ = build_triangle_bvh(mesh, BVHBuildOptions(
            min_leaf_primitives=leaf, max_leaf_primitives=leaf))
        s16 = collapse_bvh16(bvh, v, f)
        log(f"{name}: {s16.num_nodes} nodes {s16.num_leaf_rows} rows")
        s16 = s16._replace(
            nodes=jax.device_put(jnp.asarray(s16.nodes)),
            leafs=jax.device_put(jnp.asarray(s16.leafs)),
        )
        try:
            t0 = time.perf_counter()
            h = traverse_bvh8(s16, rays_t, sub=32, specialize=spec)
            _ = float(h.t.min())
            log(f"=== {name} first {time.perf_counter()-t0:.0f}s")
            if ref is None:
                ref = h
            else:
                bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
                pd = int((h.prim_id != ref.prim_id).sum())
                td = int((bc(h.t) != bc(ref.t)).sum())
                log(f"  vs l9: prim diffs {pd} t bit-diffs {td} / {res*res}")
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                h = traverse_bvh8(s16, rays_t, sub=32, specialize=spec)
                _ = float(h.t.min())
                ts.append(time.perf_counter() - t0)
            mr = res * res / min(ts) / 1e6
            results[name] = round(mr, 1)
            log(f"  {name}: {mr:.1f} Mrays/s ({[round(x*1e3) for x in ts]})")
        except Exception as e:  # noqa: BLE001
            log(f"  {name} FAILED {type(e).__name__}: {str(e)[:160]}")
            results[name] = None
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

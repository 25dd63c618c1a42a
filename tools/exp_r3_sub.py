"""Round-3 experiment batch 4: packet size + leaf-row occupancy sweep
for the specialized watertight headline engine (all within the safe
kernel-config envelope; no fault probes).

  wt_l9_sub32   calibration (exp1's wt_kzorg)
  wt_l9_sub64   8192-ray packets: half the node syncs per ray, bigger
                unions + more VREG pressure (r2 pre-spec: wash)
  wt_l9_sub16   half-size packets (pipelining headroom calibration)
  wt_l10_sub32  10-tri watertight rows: ~10% fewer leaf drains
  wt_l10_sub64  both
  woop_l9_sub64 turbo at sub64

Run: python tools/exp_r3_sub.py
"""
import os
import sys
import time

os.environ["NANORT_EXPERIMENTAL_UNCLAMP"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    n_tris = int(os.environ.get("EXP_TRIS", 1_000_000))
    res = int(os.environ.get("EXP_RES", 8192))
    reps = int(os.environ.get("EXP_REPS", 3))

    v, f = make_subdivided_sphere_scene(n_tris)
    mesh = TriangleMesh(vertices=v, faces=f)
    scenes = {}
    for leaf in (9, 10):
        bvh, _ = build_triangle_bvh(
            mesh,
            BVHBuildOptions(
                min_leaf_primitives=leaf, max_leaf_primitives=leaf
            ),
        )
        s8 = collapse_bvh8(bvh, v, f, woop=leaf == 9)
        s8 = s8._replace(
            nodes=jax.device_put(jnp.asarray(s8.nodes)),
            leafs=jax.device_put(jnp.asarray(s8.leafs)),
            leafs_woop=(
                jax.device_put(jnp.asarray(s8.leafs_woop))
                if s8.leafs_woop is not None else None
            ),
        )
        scenes[leaf] = s8
        log(f"leaf={leaf}: {s8.num_nodes} nodes {s8.num_leaf_rows} rows")

    cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                  width=res, height=res, fov=60.0)
    rays = pinhole_rays(cam)
    n_rays = res * res
    spec = None
    results = {}
    for name, leaf, sub, kw in (
        ("wt_l9_sub32", 9, 32, {}),
        ("wt_l9_sub64", 9, 64, {}),
        ("wt_l9_sub16", 9, 16, {}),
        ("wt_l10_sub32", 10, 32, {}),
        ("wt_l10_sub64", 10, 64, {}),
        ("woop_l9_sub64", 9, 64, dict(intersector="woop")),
        # fault-boundary probes (VMEM scene): the lq_cap>2 INTERNAL
        # faults in HBM mode were an undersized DMA-buffer OOB (fixed);
        # check whether the VMEM-mode fault class exists at all
        ("wt_l9_lq4", 9, 32, dict(lq_cap=4)),
        ("wt_l9_lq8", 9, 32, dict(lq_cap=8)),
    ):
        # keep tile area == packet size so packets stay square-ish
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
            h = traverse_bvh8(scenes[leaf], rays_t, sub=sub, **kw)
            _ = float(h.t.min())
            log(f"=== {name} first {time.perf_counter()-t0:.0f}s")
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                h = traverse_bvh8(scenes[leaf], rays_t, sub=sub, **kw)
                _ = float(h.t.min())
                ts.append(time.perf_counter() - t0)
            mr = n_rays / min(ts) / 1e6
            results[name] = round(mr, 1)
            log(f"  {name}: {mr:.1f} Mrays/s ({[round(x*1e3) for x in ts]})")
        except Exception as e:  # noqa: BLE001
            log(f"  {name} FAILED {type(e).__name__}: {str(e)[:200]}")
            results[name] = None

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()

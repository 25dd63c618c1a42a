"""Round-3 experiment batch 3: the 10M-triangle cliff (VERDICT r2 #2).

At 10M tris the leaf table (570 MB) streams from HBM per drain
(scene_space="hbm_leafs"); r2 measured 6.8 Mrays/s with at most
lq_cap=2 leaf DMAs in flight. This batch measures, in ONE process,
ascending fault risk LAST (a faulted process stays poisoned):

  wt_spec_lq2      specialized watertight, lq_cap=2 (r2 baseline + spec)
  dbg_counts       per-packet node-pop/leaf-drain counters (bottleneck id)
  wt_spec_lq4/8/16 deeper DMA pipelines (lq_cap>2 faults VMEM scenes;
                   the DMA path is a different mechanism - measure it)

Run: python tools/exp_r3_tenm.py
"""
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
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    n_tris = int(os.environ.get("EXP_TRIS", 10_000_000))
    res = int(os.environ.get("EXP_RES", 4096))
    reps = int(os.environ.get("EXP_REPS", 2))

    t0 = time.perf_counter()
    v, f = make_subdivided_sphere_scene(n_tris)
    log(f"scene gen {time.perf_counter()-t0:.1f}s ({len(f)} tris)")
    mesh = TriangleMesh(vertices=v, faces=f)
    t0 = time.perf_counter()
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9)
    )
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    s8 = collapse_bvh8(bvh, v, f)
    collapse_s = time.perf_counter() - t0
    log(f"build {build_s:.1f}s collapse {collapse_s:.1f}s "
        f"({s8.num_nodes} nodes, {s8.num_leaf_rows} leaf rows)")
    t0 = time.perf_counter()
    s8 = s8._replace(nodes=jax.device_put(jnp.asarray(s8.nodes)),
                     leafs=jax.device_put(jnp.asarray(s8.leafs)))
    log(f"device_put {time.perf_counter()-t0:.1f}s")

    cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                  width=res, height=res, fov=60.0)
    rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
    n_rays = res * res
    spec = detect_specialization(rays_t)
    log(f"spec {spec}")

    # canary: a tiny packet-kernel launch proves the worker is fully
    # recovered before the 800 MB scene hits it (FAILED_PRECONDITION on
    # the first launch = still-recovering worker, retry after a wait)
    from nanort_tpu.io.procedural import make_cornell_box
    cv, cf = make_cornell_box(2.0)
    cmesh = TriangleMesh(vertices=cv, faces=cf)
    cbvh, _ = build_triangle_bvh(
        cmesh, BVHBuildOptions(min_leaf_primitives=4, max_leaf_primitives=4)
    )
    cs8 = collapse_bvh8(cbvh, cv, cf)
    cs8 = cs8._replace(nodes=jnp.asarray(cs8.nodes),
                       leafs=jnp.asarray(cs8.leafs))
    ccam = look_at(eye=(0.0, 0.0, 5.0), center=(0.0, 0.0, 0.0),
                   width=64, height=64, fov=45.0)
    crays, _ = tile_image_rays(pinhole_rays(ccam), 64, 64)
    for attempt in range(5):
        try:
            hc = traverse_bvh8(cs8, crays, sub=8)
            log(f"canary ok (attempt {attempt}): t.min "
                f"{float(hc.t.min()):.3f}")
            break
        except Exception as e:  # noqa: BLE001
            log(f"canary attempt {attempt} failed {type(e).__name__}; "
                "sleeping 150s")
            time.sleep(150)
    else:
        log("canary never passed; aborting")
        return

    def timed(name, **kw):
        try:
            t0 = time.perf_counter()
            h = traverse_bvh8(s8, rays_t, specialize=spec, **kw)
            _ = float(h.t.min())
            log(f"  {name} first {time.perf_counter()-t0:.0f}s")
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                h = traverse_bvh8(s8, rays_t, specialize=spec, **kw)
                _ = float(h.t.min())
                ts.append(time.perf_counter() - t0)
            log(f"  {name}: {n_rays/min(ts)/1e6:.2f} Mrays/s "
                f"({[round(x*1e3) for x in ts]} ms)")
            return True
        except Exception as e:  # noqa: BLE001
            log(f"  {name} FAILED {type(e).__name__}: {str(e)[:300]}")
            return False

    os.environ["NANORT_EXPERIMENTAL_UNCLAMP"] = "1"
    timed("wt_spec_lq2", lq_cap=2)
    # bottleneck diagnosis: per-packet visit counters ride out in u/v
    try:
        h = traverse_bvh8(s8, rays_t, specialize=spec, debug_counts=True)
        pops = np.asarray(h.u.reshape(-1)[:: 4096])
        drains = np.asarray(h.v.reshape(-1)[:: 4096])
        log(f"  dbg: node pops/packet mean {pops.mean():.0f} "
            f"p95 {np.percentile(pops, 95):.0f}; leaf drains/packet "
            f"mean {drains.mean():.0f} p95 {np.percentile(drains, 95):.0f}")
    except Exception as e:  # noqa: BLE001
        log(f"  dbg FAILED {type(e).__name__}")
    for cap in (4, 8, 16):
        if not timed(f"wt_spec_lq{cap}", lq_cap=cap):
            break


if __name__ == "__main__":
    main()

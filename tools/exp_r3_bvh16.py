"""Round-3 experiment batch 2: BVH16 node phase + sub sweep.

BVH16 = 16-wide nodes over two consecutive rows, fetched as ONE (2, 128)
dynamic slice -> 16 slab tests per vector->scalar sync (the node-phase
bottleneck), with pop_n=2 giving 32 per sync — pop_4-equivalent without
the >2-in-flight-fetch backend fault.

Run: python tools/exp_r3_bvh16.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import (
        build_woop_leafs,
        collapse_bvh8,
        collapse_bvh16,
    )
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
    t0 = time.perf_counter()
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9)
    )
    log(f"build {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    woop = jax.device_put(jnp.asarray(build_woop_leafs(bvh, v, f)))
    s8 = collapse_bvh8(bvh, v, f)
    s16 = collapse_bvh16(bvh, v, f)
    log(f"collapse8+16+woop {time.perf_counter()-t0:.1f}s; "
        f"bvh8 {s8.num_nodes} nodes depth {s8.depth}; "
        f"bvh16 {s16.num_nodes} nodes depth {s16.depth}")
    s8 = s8._replace(nodes=jax.device_put(jnp.asarray(s8.nodes)),
                     leafs=jax.device_put(jnp.asarray(s8.leafs)),
                     leafs_woop=woop)
    s16 = s16._replace(nodes=jax.device_put(jnp.asarray(s16.nodes)),
                       leafs=s8.leafs, leafs_woop=woop)

    cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                  width=res, height=res, fov=60.0)
    rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
    n_rays = res * res
    spec = detect_specialization(rays_t)
    log(f"spec {spec}")

    variants = [
        ("wt8_kzorg", s8, dict(specialize=spec)),
        ("wt16_kzorg", s16, dict(specialize=spec)),
        ("woop16_org", s16, dict(intersector="woop",
                                 specialize=(None, spec[1]))),
        ("wt16_kzorg_sub64", s16, dict(specialize=spec, sub=64)),
        ("woop8_org", s8, dict(intersector="woop",
                               specialize=(None, spec[1]))),
        ("wt16_kzorg_pop1", s16, dict(specialize=spec, pop_n=1)),
    ]
    base_hits = {}
    results = {}
    for name, sc, kw in variants:
        log(f"=== {name}")
        try:
            t0 = time.perf_counter()
            h = traverse_bvh8(sc, rays_t, sub=kw.pop("sub", 32), **kw)
            _ = float(h.t.min())
            log(f"  first call {time.perf_counter()-t0:.0f}s")
            eng = kw.get("intersector", "watertight")
            if eng in base_hits:
                b = base_hits[eng]
                bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
                log(f"  vs {eng} base: prim {int((h.prim_id != b.prim_id).sum())}"
                    f" t {int((bc(h.t) != bc(b.t)).sum())}")
            else:
                base_hits[eng] = h
            sub = 64 if "sub64" in name else 32
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                h = traverse_bvh8(sc, rays_t, sub=sub, **kw)
                _ = float(h.t.min())
                ts.append(time.perf_counter() - t0)
            mr = n_rays / min(ts) / 1e6
            results[name] = round(mr, 1)
            log(f"  {name}: {mr:.1f} Mrays/s "
                f"({[round(x*1e3) for x in ts]} ms)")
        except Exception as e:  # noqa: BLE001
            log(f"  {name} FAILED: {type(e).__name__}: {str(e)[:300]}")
            results[name] = None
            time.sleep(150)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()

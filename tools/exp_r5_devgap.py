"""Device-build quality gap, r5 closing measurement (VERDICT r4 #4).

exp_r5_devorder measured the pieces separately on the 1M headline
config: dev as-built 129.8, dev+preorder 132.6, host-SAH 147.0
(tools/logs/exp_r5_devorder.json), and the r4 leaf-merge probe sized
~8.9% fewer leaf rows. bfbd9f8 then defaulted BOTH extras on — but the
combined stack (LBVH + leaf-merge + device preorder) was never traced.
This measures exactly that against host-SAH under identical rays/spec,
with visit counts for attribution. Bar: within 5% of host-SAH.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.build.device_collapse import collapse_lbvh_device
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import (
    detect_specialization, tile_image_rays, traverse_bvh8)

RES = 8192
SUB = 32
results = {}


def bench(tag, scene, rays_t, spec, reps=3):
    h = traverse_bvh8(scene, rays_t, sub=SUB, specialize=spec)
    float(h.t.min())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        h = traverse_bvh8(scene, rays_t, sub=SUB, specialize=spec)
        float(h.t.min())
        ts.append(time.perf_counter() - t0)
    hd = traverse_bvh8(scene, rays_t, sub=SUB, specialize=spec,
                       debug_counts=True)
    row = {"mrays": round(RES * RES / min(ts) / 1e6, 1),
           "pops": round(float(jnp.mean(hd.u)), 2),
           "drains": round(float(jnp.mean(hd.v)), 2),
           "leaf_rows": int(scene.num_leaf_rows),
           "hitfrac": round(float(jnp.mean(
               (h.t < rays_t.max_t).astype(jnp.float32))), 4)}
    results[tag] = row
    print(f"# {tag}: {json.dumps(row)}", flush=True)
    return h


def main():
    v, f = make_subdivided_sphere_scene(1_000_000)
    cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                  width=RES, height=RES, fov=60.0)
    rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
    spec = detect_specialization(rays_t, sub=SUB)
    print(f"# spec {spec}", flush=True)

    vd = jax.device_put(jnp.asarray(v))
    fd = jax.device_put(jnp.asarray(f))
    t0 = time.perf_counter()
    sd = collapse_lbvh_device(vd, fd, width=16, max_leaf=9,
                              merge_leaves=True, preorder=True)
    float(np.asarray(sd.nodes[0, 0]))
    results["dev_build_first_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    del sd
    sd = collapse_lbvh_device(vd, fd, width=16, max_leaf=9,
                              merge_leaves=True, preorder=True)
    float(np.asarray(sd.nodes[0, 0]))
    results["dev_build_warm_s"] = round(time.perf_counter() - t0, 2)
    print(f"# device build warm {results['dev_build_warm_s']}s "
          f"({sd.num_nodes} nodes, {sd.num_leaf_rows} leaf rows)",
          flush=True)
    bench("dev_default", sd, rays_t, spec)
    del sd

    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
    s16 = collapse_bvh8(bvh, v, f, width=16)
    s16 = s16._replace(nodes=jax.device_put(jnp.asarray(s16.nodes)),
                       leafs=jax.device_put(jnp.asarray(s16.leafs)))
    bench("host_sah", s16, rays_t, spec)
    results["gap_pct"] = round(
        100.0 * (1 - results["dev_default"]["mrays"]
                 / results["host_sah"]["mrays"]), 1)

    with open("tools/logs/exp_r5_devgap.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

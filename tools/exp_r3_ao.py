"""Round-3: config A (objrender AO 512^2 + 8 samples) knob sweep —
octant_major packing and sub size for the occlusion megabatch
(render_ao forwards trace kwargs since round 3).

Run: nohup python tools/exp_r3_ao.py > tools/logs/exp_r3_ao.out 2> tools/logs/exp_r3_ao.log &
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


def timeit(tag, fn, n=3):
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

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import (
        make_cornell_box, make_uv_sphere, merge_meshes,
    )
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.objrender import render_ao
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import detect_specialization

    opt8 = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(64, 128, 0.6))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh, opt8)
    s8 = collapse_bvh8(bvh, v, f, width=16)
    s8 = s8._replace(nodes=jnp.asarray(s8.nodes), leafs=jnp.asarray(s8.leafs))
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=512, height=512, fov=45.0)
    rays = pinhole_rays(cam)
    key = jax.random.PRNGKey(7)
    spec_a = detect_specialization(rays)
    log(f"configA scene {len(f)} tris (width16 tables)")

    aos = {}

    def run_a(tag, **kw):
        def go():
            aovs, hits = render_ao(bvh, mesh, rays, key, n_samples=8,
                                   max_leaf=8, scene8=s8, specialize=spec_a,
                                   **kw)
            float(np.asarray(aovs["ao"].min()))
            return aovs["ao"]
        a = go()
        aos[tag] = np.asarray(a)
        timeit(tag, lambda: go())

    run_a("cfgA_base_ms")
    run_a("cfgA_oct_ms", octant_major=True)
    run_a("cfgA_oct_sub8_ms", octant_major=True, sub=8)
    run_a("cfgA_oct_sub16_ms", octant_major=True, sub=16)
    run_a("cfgA_sub8_ms", sub=8)
    base = aos["cfgA_base_ms"]
    for k, vv in aos.items():
        if k != "cfgA_base_ms":
            RES["maxdiff_" + k] = float(np.abs(vv - base).max())
    print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(f"FATAL {type(e).__name__}: {e}")
        raise

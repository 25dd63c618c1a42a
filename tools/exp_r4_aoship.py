"""r4 wave 5b: end-to-end config-A AO with the shipped stratified+tiled
recipe (models/objrender.render_ao after the exp_r4_aostrat adoption),
plus a decomposition of the primary pass (bare traverse vs render_aovs
glue) to find the remaining distance to the 100 ms bar.

Run: nohup python tools/exp_r4_aoship.py > \
    tools/logs/exp_r4_aoship.out 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = {}


def emit(k, v):
    OUT[k] = v
    print(json.dumps(OUT), flush=True)


def timeit(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts) * 1e3)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import (
        make_cornell_box, make_uv_sphere, merge_meshes,
    )
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.objrender import render_ao, render_aovs
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization, traverse_bvh8,
    )

    opt8 = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(64, 128, 0.6))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh, opt8)
    s8 = collapse_bvh8(bvh, v, f, width=16)
    s8 = s8._replace(nodes=jnp.asarray(s8.nodes), leafs=jnp.asarray(s8.leafs))
    emit("tris", int(len(f)))
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=512, height=512, fov=45.0)
    rays = pinhole_rays(cam)
    key = jax.random.PRNGKey(7)
    spec = detect_specialization(rays)

    def run(tag, fn):
        try:
            emit(tag + "_ms", timeit(fn))
        except Exception as e:  # noqa: BLE001
            emit(tag + "_err", f"{type(e).__name__}: {e}"[:160])
            time.sleep(130)

    for sub in (8, 16):
        run(f"ao_ship_sub{sub}", lambda sub=sub: float(render_ao(
            bvh, mesh, rays, key, n_samples=8, max_leaf=8, scene8=s8,
            specialize=spec, sub=sub)[0]["ao"].min()))
    # legacy path (r3 recipe) for the same-hour comparison
    run("ao_legacy", lambda: float(render_ao(
        bvh, mesh, rays, key, n_samples=8, max_leaf=8, scene8=s8,
        specialize=spec, stratified=False, octant_major=True,
        sub=8)[0]["ao"].min()))

    # primary decomposition
    run("primary_aovs", lambda: float(render_aovs(
        bvh, mesh, rays, None, max_leaf=8, scene8=s8,
        specialize=spec)[0]["depth"].min()))
    from nanort_tpu.traverse.pallas_packet import tile_image_rays
    rays_t, _ = tile_image_rays(rays, 32, 32)
    run("primary_bare", lambda: float(traverse_bvh8(
        s8, rays_t, specialize=spec, sub=8).t.min()))


if __name__ == "__main__":
    main()

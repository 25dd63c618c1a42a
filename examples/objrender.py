#!/usr/bin/env python
"""objrender: OBJ -> BVH build (timed) -> primary rays -> normal-shaded PNG.

Mirror of reference examples/objrender/main.cc:581-709.
Usage: python examples/objrender.py [scene.obj] [out.png] [size]
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax.numpy as jnp

import nanort_tpu as nrt
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.models.objrender import render_aovs
from nanort_tpu.utils.image import save_png


def main():
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    out = sys.argv[2] if len(sys.argv) > 2 else "objrender.png"
    if len(sys.argv) > 1:
        from nanort_tpu.io.obj import load_obj
        m = load_obj(sys.argv[1])
        v, f = m.vertices, m.faces
    else:
        from nanort_tpu.io.procedural import make_cornell_box, make_uv_sphere, merge_meshes
        v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(32, 64, 0.5))
    mesh = nrt.TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))

    t0 = time.perf_counter()
    bvh, stats = nrt.build_triangle_bvh(mesh)
    print(f"BVH build time: {time.perf_counter()-t0:.3f} secs")
    print(f"  # of leaf   nodes: {stats.num_leaf_nodes}")
    print(f"  # of branch nodes: {stats.num_branch_nodes}")
    print(f"  Max tree depth   : {stats.max_tree_depth}")

    center = 0.5 * (v.min(0) + v.max(0))
    ext = float(np.linalg.norm(v.max(0) - v.min(0)))
    cam = look_at(eye=center + [0, 0, 1.2 * ext], center=center,
                  width=size, height=size, fov=45.0)
    rays = pinhole_rays(cam)
    t0 = time.perf_counter()
    aovs, hits = render_aovs(bvh, mesh, rays)
    rgb = np.asarray(aovs["rgb"])
    print(f"Render {time.perf_counter()-t0:.3f} secs")
    save_png(out, rgb, gamma=1.0)
    print(f"wrote {out} ({np.asarray(hits.hit).mean()*100:.1f}% hit)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Progressive viewer loop (reference examples/gui architecture): a render
thread accumulates AO passes with the cancel/refresh contract; here the
"UI" is a terminal loop printing pass status and writing snapshots.
Usage: python examples/viewer.py [seconds] [camera_type]
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax.numpy as jnp

import nanort_tpu as nrt
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_cornell_box, make_uv_sphere, merge_meshes
from nanort_tpu.models.cameras import generate_rays, look_at
from nanort_tpu.models.objrender import render_ao
from nanort_tpu.models.progressive import ProgressiveRenderer
from nanort_tpu.utils.image import save_png


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    cam_type = sys.argv[2] if len(sys.argv) > 2 else "perspective"
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(24, 48, 0.5))
    mesh = nrt.TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    opts = nrt.BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    bvh, _ = nrt.build_triangle_bvh(mesh, opts)
    s8 = collapse_bvh8(bvh, v, f)
    s8 = s8._replace(nodes=jnp.asarray(s8.nodes), leafs=jnp.asarray(s8.leafs))
    cam = look_at(eye=(0, 0, 2.4), center=(0, 0, 0), width=128, height=128, fov=60)
    rays = generate_rays(cam, cam_type)

    def render_pass(p, key):
        aovs, _ = render_ao(bvh, mesh, rays, key, n_samples=2, max_leaf=8,
                            scene8=s8)
        return {"rgb": np.asarray(aovs["rgb"])}

    r = ProgressiveRenderer(render_pass, max_passes=128).start()
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        time.sleep(0.5)
        print(f"pass {r.passes_done}/128")
    snap = r.snapshot()
    r.quit()
    if snap:
        save_png("viewer.png", np.clip(snap["rgb"], 0, 1))
        print(f"wrote viewer.png after {r.passes_done} passes")


if __name__ == "__main__":
    main()

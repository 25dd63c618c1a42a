"""Minimal deliberate repro of the v5e pop_n>2 fault class
(tools/experiments/v5e_popn_fault.md).

WARNING: a successful repro FAULTS the TPU worker (~2 min recovery and
every run submitted meanwhile fails UNAVAILABLE). Run only when the
TPU queue is otherwise empty, and only with NANORT_FAULTPROBE=1.

Protocol: same kernel, two scenes (100K tris: expected OK at pop_n=3;
1M tris: expected INTERNAL fault at pop_n=3), pop_n=2 control on both.
Captures the exact backend error string into
tools/logs/exp_r5_faultprobe.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")

if os.environ.get("NANORT_FAULTPROBE") != "1":
    sys.exit("refusing to run without NANORT_FAULTPROBE=1 "
             "(this deliberately faults the TPU worker)")
os.environ["NANORT_EXPERIMENTAL_UNCLAMP"] = "1"

import jax
import jax.numpy as jnp

from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import tile_image_rays, traverse_bvh8

out = {}
for tris, res in ((100_000, 1024), (1_000_000, 2048)):
    v, f = make_subdivided_sphere_scene(tris)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
    s16 = collapse_bvh8(bvh, v, f, width=16)
    s16 = s16._replace(nodes=jax.device_put(jnp.asarray(s16.nodes)),
                       leafs=jax.device_put(jnp.asarray(s16.leafs)))
    cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                  width=res, height=res, fov=60.0)
    rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
    for pop_n in (2, 3):
        tag = f"{tris}_pop{pop_n}"
        try:
            h = traverse_bvh8(s16, rays_t, sub=32, pop_n=pop_n)
            float(h.t.min())
            out[tag] = {"ok": True}
        except Exception as e:
            out[tag] = {"ok": False,
                        "error": f"{type(e).__name__}: {e}"[:400]}
            print(f"# {tag} FAULTED — waiting out worker recovery",
                  flush=True)
            time.sleep(150)
        print(f"# {tag}: {json.dumps(out[tag])[:200]}", flush=True)

with open("tools/logs/exp_r5_faultprobe.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps(out))

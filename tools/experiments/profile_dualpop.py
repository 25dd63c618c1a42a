"""A/B dual-pop (16 slab tests per scalar sync) vs single-pop on the
bench scene. Run on real TPU: nohup python tools/profile_dualpop.py &"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import tile_image_rays, traverse_bvh8

res = 8192
v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
bvh, _ = build_triangle_bvh(
    mesh, BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
)
s8 = collapse_bvh8(bvh, v, f)
s8 = s8._replace(
    nodes=jax.device_put(jnp.asarray(s8.nodes)),
    leafs=jax.device_put(jnp.asarray(s8.leafs)),
)
cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
              width=res, height=res, fov=60.0)
rays, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
n_rays = res * res

results = {}
for dual in (True, False):
    name = "dual" if dual else "single"
    t0 = time.perf_counter()
    h0 = traverse_bvh8(s8, rays, dual_pop=dual)
    float(h0.t.min())
    print(f"{name}: first {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        h = traverse_bvh8(s8, rays, dual_pop=dual)
        float(h.t.min())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: best {min(ts)*1e3:.1f} ms -> {n_rays/min(ts)/1e6:.1f} Mrays/s",
          flush=True)
    results[name] = jax.tree_util.tree_map(np.asarray, h0)

a, b = results["dual"], results["single"]
print("t equal:", np.array_equal(a.t, b.t),
      "pid equal:", np.array_equal(a.prim_id, b.prim_id))
d = np.nonzero(a.prim_id != b.prim_id)[0]
if d.size:
    m = d
    same_t = np.allclose(a.t.reshape(-1)[m], b.t.reshape(-1)[m], rtol=1e-6)
    print(f"  {d.size} prim diffs; t close (ties): {same_t}")

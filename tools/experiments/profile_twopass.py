"""A/B the in-kernel two-pass exact traversal vs single-pass exact on the
bench scene. Run on real TPU: nohup python tools/profile_twopass.py &"""
import os
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

n_tris = int(os.environ.get("N_TRIS", 1_000_000))
res = int(os.environ.get("RES", 8192))
v, f = make_subdivided_sphere_scene(n_tris)
mesh = TriangleMesh(vertices=v, faces=f)
bvh, stats = build_triangle_bvh(
    mesh, BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
)
s8 = collapse_bvh8(bvh, v, f)
s8 = s8._replace(
    nodes=jax.device_put(jnp.asarray(s8.nodes)),
    leafs=jax.device_put(jnp.asarray(s8.leafs)),
)
print(f"scene {len(f)} tris, {s8.num_nodes} BVH8 nodes", flush=True)

cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
              width=res, height=res, fov=60.0)
rays, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
n_rays = res * res


def run(mode):
    h = traverse_bvh8(s8, rays, exact_mode=mode)
    return float(h.t.min()), h


results = {}
for mode in ("twopass", "single"):
    t0 = time.perf_counter()
    _, h0 = run(mode)
    print(f"{mode}: first call {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(mode)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{mode}: best {best*1e3:.1f} ms -> {n_rays/best/1e6:.1f} Mrays/s",
          flush=True)
    results[mode] = jax.tree_util.tree_map(np.asarray, h0)

a, b = results["twopass"], results["single"]
print("bit-identical t:", np.array_equal(a.t, b.t))
print("bit-identical pid:", np.array_equal(a.prim_id, b.prim_id))
if not np.array_equal(a.prim_id, b.prim_id):
    d = np.nonzero(a.prim_id != b.prim_id)
    print("  diffs:", len(d[0]), "first few:", [x[:5] for x in d])

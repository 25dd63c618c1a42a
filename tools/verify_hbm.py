"""Verify + time the HBM-resident scene spaces of the packet kernel.

Phase 1 (correctness): small scene, all three scene_space modes must
produce identical hit records.
Phase 2 (timing): 1M-tri bench scene at RES (default 4096), Mrays/s for
vmem vs hbm_leafs vs hbm.

Run on real TPU: nohup python tools/verify_hbm.py > /tmp/hbm.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from nanort_tpu import BVHBuildOptions, build_triangle_bvh, make_rays
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import (
    make_cornell_box,
    make_subdivided_sphere_scene,
    make_uv_sphere,
    merge_meshes,
)
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import tile_image_rays, traverse_bvh8

opt8 = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)

# ---- phase 1: parity on a small scene ----
v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(16, 32, 0.5))
mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
bvh, _ = build_triangle_bvh(mesh, opt8)
s8 = collapse_bvh8(bvh, v, f)
rng = np.random.default_rng(5)
n = 3000
org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
tgt = rng.uniform(-0.8, 0.8, (n, 3))
d = tgt - org
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays = make_rays(org, d.astype(np.float32))

ref = None
for space in ("vmem", "hbm_leafs", "hbm"):
    t0 = time.perf_counter()
    got = traverse_bvh8(s8, rays, scene_space=space)
    got = jax.tree_util.tree_map(np.asarray, got)
    print(f"{space}: compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    if ref is None:
        ref = got
    else:
        ok = all(
            np.array_equal(getattr(got, k), getattr(ref, k))
            for k in ("t", "u", "v", "prim_id")
        )
        print(f"{space} identical to vmem: {ok}", flush=True)
        assert ok, space

# ---- phase 2: timing at 1M tris ----
res = int(os.environ.get("RES", 4096))
v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
bvh, _ = build_triangle_bvh(mesh, opt8)
s8 = collapse_bvh8(bvh, v, f)
s8 = s8._replace(
    nodes=jax.device_put(jnp.asarray(s8.nodes)),
    leafs=jax.device_put(jnp.asarray(s8.leafs)),
)
from nanort_tpu.models.cameras import look_at, pinhole_rays

cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
              width=res, height=res, fov=60.0)
rays, _ = tile_image_rays(pinhole_rays(cam), min(128, res), 64)
n_rays = res * res
for space in ("vmem", "hbm_leafs", "hbm"):
    t0 = time.perf_counter()
    h = traverse_bvh8(s8, rays, scene_space=space)
    print(f"{space}: first call {time.perf_counter()-t0:.0f}s "
          f"(hit {float(np.asarray(h.hit).mean()):.3f})", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        h = traverse_bvh8(s8, rays, scene_space=space)
        float(h.t.min())
        ts.append(time.perf_counter() - t0)
    print(f"{space}: best {min(ts)*1e3:.1f} ms -> "
          f"{n_rays/min(ts)/1e6:.1f} Mrays/s", flush=True)

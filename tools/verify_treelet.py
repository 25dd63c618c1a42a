"""Verify + time the treelet-binned incoherent engine on real TPU.

Phase 1: parity vs brute force on random rays (small scene).
Phase 2: fully-random-ray throughput on the 1M-tri scene.

Run: nohup python tools/verify_treelet.py > /tmp/treelet.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from nanort_tpu import (
    BVHBuildOptions,
    build_triangle_bvh,
    brute_force_traverse,
    make_rays,
)
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import (
    make_cornell_box,
    make_subdivided_sphere_scene,
    make_uv_sphere,
    merge_meshes,
)
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.treelet import make_treelets, traverse_bvh8_binned

opt8 = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)

# ---- phase 1: parity ----
v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(16, 32, 0.5))
mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
bvh, _ = build_triangle_bvh(mesh, opt8)
s8 = collapse_bvh8(bvh, v, f)
tl, s8a = make_treelets(s8, 16)
print(f"small scene: {tl.count} treelets, roots {tl.roots[:8]}...", flush=True)

rng = np.random.default_rng(5)
n = 3000
org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
tgt = rng.uniform(-0.8, 0.8, (n, 3))
d = tgt - org
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays = make_rays(org, d.astype(np.float32))

t0 = time.perf_counter()
got = traverse_bvh8_binned(s8a, rays, treelets=tl, K=8, sub=8)
got = jax.tree_util.tree_map(np.asarray, got)
print(f"binned first call {time.perf_counter()-t0:.0f}s", flush=True)
want = jax.tree_util.tree_map(np.asarray, brute_force_traverse(mesh, rays))
gh = got.prim_id != 0xFFFFFFFF
wh = want.prim_id != 0xFFFFFFFF
print("hit agree:", (gh == wh).all(), f"({gh.sum()}/{n})", flush=True)
m = gh & wh
same = got.prim_id[m] == want.prim_id[m]
print(f"prim agree: {same.mean()*100:.2f}%;",
      "t close where differs:",
      np.allclose(got.t[m][~same], want.t[m][~same], rtol=1e-6)
      if (~same).any() else "n/a", flush=True)
assert (gh == wh).all()

# ---- phase 2: throughput, fully random on 1M tris ----
R = int(os.environ.get("N_RAYS", 4_194_304))
v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
bvh, _ = build_triangle_bvh(mesh, opt8)
s8 = collapse_bvh8(bvh, v, f)
s8 = s8._replace(nodes=jax.device_put(jnp.asarray(s8.nodes)),
                 leafs=jax.device_put(jnp.asarray(s8.leafs)))
lo, hi = np.asarray(bvh.bmin[0]), np.asarray(bvh.bmax[0])
org = rng.uniform(lo, hi, (R, 3)).astype(np.float32)
d = rng.normal(size=(R, 3))
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays = make_rays(org, d.astype(np.float32))

for T, K, sub in ((512, 8, 8), (1024, 8, 8), (2048, 12, 8)):
    tl, s8a = make_treelets(s8, T)
    s8a = s8a._replace(nodes=jax.device_put(jnp.asarray(s8a.nodes)))
    t0 = time.perf_counter()
    h = traverse_bvh8_binned(s8a, rays, treelets=tl, K=K, sub=sub)
    float(h.t.min())
    print(f"T={tl.count} K={K} sub={sub}: first {time.perf_counter()-t0:.0f}s",
          flush=True)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        h = traverse_bvh8_binned(s8a, rays, treelets=tl, K=K, sub=sub)
        float(h.t.min())
        ts.append(time.perf_counter() - t0)
    hitfrac = float(np.asarray(h.hit).mean())
    print(f"T={tl.count} K={K} sub={sub}: best {min(ts)*1e3:.0f} ms -> "
          f"{R/min(ts)/1e6:.2f} Mrays/s (hit {hitfrac:.3f})", flush=True)

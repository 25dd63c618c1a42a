"""Prove the chunk-sharded packet layout on ONE real TPU chip: traverse
>= 2 per-chunk BVH8 tables sequentially through the Pallas kernel with
the ring's merge rule and compare against the single-BVH packet result
(VERDICT r2 #6). Run: python tools/verify_sharded_packet.py"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from nanort_tpu import BVHBuildOptions, build_triangle_bvh, make_rays
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.parallel.sharded_scene import (
    build_scene_chunks,
    sequential_chunk_traverse,
)
from nanort_tpu.traverse.pallas_packet import traverse_bvh8
from nanort_tpu.traverse.ray_sort import traverse_bvh8_sorted

v, f = make_subdivided_sphere_scene(200_000)
mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
opts = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)

t0 = time.perf_counter()
sc = build_scene_chunks(mesh, 4, opts, packet=True)
print(f"4 packet chunks built in {time.perf_counter()-t0:.1f}s "
      f"(nodes8 {sc.nodes8.shape}, leafs8 {sc.leafs8.shape})")

bvh, _ = build_triangle_bvh(mesh, opts)
s8 = collapse_bvh8(bvh, v, f)
s8 = s8._replace(nodes=jnp.asarray(s8.nodes), leafs=jnp.asarray(s8.leafs))

rng = np.random.default_rng(17)
n = 100_000
org = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
tgt = rng.uniform(-0.7, 0.7, (n, 3))
d = tgt - org
d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
rays = make_rays(org, d)

t0 = time.perf_counter()
got = jax.tree_util.tree_map(
    np.asarray, sequential_chunk_traverse(sc, rays)
)
print(f"sequential 4-chunk packet traversal {time.perf_counter()-t0:.1f}s "
      "(incl compiles)")
want = jax.tree_util.tree_map(
    np.asarray, traverse_bvh8_sorted(s8, rays)
)

gh = got.prim_id != 0xFFFFFFFF
wh = want.prim_id != 0xFFFFFFFF
print("hit agree:", bool((gh == wh).all()), f"({int(gh.sum())}/{n} hits)")
m = gh & wh
same = got.prim_id[m] == want.prim_id[m]
print(f"prim agree: {same.mean()*100:.3f}% (rest must be equal-t ties)")
ok_t = np.allclose(got.t[m], want.t[m], rtol=1e-5)
print("t close everywhere:", bool(ok_t))
diff = ~same
if diff.any():
    print("tie check: max rel t diff on prim-diff rays:",
          float(np.max(np.abs(got.t[m][diff] - want.t[m][diff])
                       / want.t[m][diff])))
assert (gh == wh).all() and ok_t and same.mean() > 0.97
print("OK: chunk-sharded packet layout reproduces the single-BVH result")

"""Incoherent-ray throughput: wavefront vs sorted-packet engines.

Fully-random rays (random origins in the scene bbox, random directions)
on the 1M-tri bench scene — the workload class where packet traversal
collapses (union-of-paths blowup). The wavefront engine walks each ray's
own path, so it should be the incoherent engine of record.

Run on real TPU: nohup python tools/bench_incoherent.py > /tmp/inc.log 2>&1 &
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
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.packed import pack_scene
from nanort_tpu.traverse.ray_sort import sort_rays, traverse_bvh8_sorted
from nanort_tpu.traverse.wavefront import traverse_wavefront

R = int(os.environ.get("N_RAYS", 4_194_304))
v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
bvh, _ = build_triangle_bvh(
    mesh, BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
)
scene = pack_scene(bvh, v, f)
scene = scene.__class__(
    jax.device_put(jnp.asarray(scene.nodes)),
    jax.device_put(jnp.asarray(scene.soup)),
    scene.num_nodes,
    scene.num_prims,
)
lo = np.asarray(bvh.bmin[0])
hi = np.asarray(bvh.bmax[0])
rng = np.random.default_rng(11)
org = rng.uniform(lo, hi, (R, 3)).astype(np.float32)
d = rng.normal(size=(R, 3))
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays = make_rays(org, d.astype(np.float32))
print(f"{R} fully-random rays, 1M tris", flush=True)


def timeit(name, fn, reps=2):
    t0 = time.perf_counter()
    h = fn()
    float(h.t.min())
    print(f"{name}: first {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        h = fn()
        float(h.t.min())
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name}: {best*1e3:.0f} ms -> {R/best/1e6:.2f} Mrays/s", flush=True)
    return h


srt, order, unsort = sort_rays(rays, lo, hi)
jax.block_until_ready(srt)

res = {}
for tile in (4096, 16384):
    res[f"wf_sorted_{tile}"] = timeit(
        f"wavefront sorted tile={tile}",
        lambda t=tile: unsort(traverse_wavefront(scene, srt, max_leaf=8, tile=t)),
    )
res["wf_unsorted"] = timeit(
    "wavefront unsorted tile=4096",
    lambda: traverse_wavefront(scene, rays, max_leaf=8, tile=4096),
)
# sanity: engines agree
a, b = res["wf_sorted_4096"], res["wf_unsorted"]
print("sorted == unsorted:",
      np.array_equal(np.asarray(a.prim_id), np.asarray(b.prim_id)), flush=True)

if os.environ.get("WITH_PACKET", "1") == "1":
    s8 = collapse_bvh8(bvh, v, f)
    s8 = s8._replace(
        nodes=jax.device_put(jnp.asarray(s8.nodes)),
        leafs=jax.device_put(jnp.asarray(s8.leafs)),
    )
    timeit("packet sorted sub=32",
           lambda: traverse_bvh8_sorted(s8, rays), reps=1)

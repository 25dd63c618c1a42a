"""Batched Pallas kernel experiments on the 1M-tri scene (slow compiles:
run in background). Times use forced scalar readback (the axon tunnel's
block_until_ready does not actually block)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
import jax.tree_util as jtu
from nanort_tpu import BVHBuildOptions, BVHTraceOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import traverse_bvh8, tile_image_rays
from nanort_tpu.models.cameras import look_at, pinhole_rays

v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
cam = look_at(eye=(0,0,2.2), center=(0,0,0), width=1024, height=1024, fov=60.0)
rays = pinhole_rays(cam)

scenes = {}
for leaf in (4, 8):
    t0=time.perf_counter()
    opts = BVHBuildOptions(min_leaf_primitives=leaf, max_leaf_primitives=leaf)
    bvh, _ = build_triangle_bvh(mesh, opts)
    s8 = collapse_bvh8(bvh, v, f)
    s8 = s8._replace(nodes=jax.device_put(jnp.asarray(s8.nodes)),
                     leafs=jax.device_put(jnp.asarray(s8.leafs)))
    scenes[leaf] = s8
    print(f"[build] leaf={leaf}: {time.perf_counter()-t0:.0f}s nodes={s8.num_nodes} rows={s8.num_leaf_rows} depth={s8.depth}", flush=True)

def bench(label, s8, rays_flat, opt, reps=3):
    def run():
        h = traverse_bvh8(s8, rays_flat, opt)
        return float(h.t.min())
    t0=time.perf_counter(); run(); print(f"[compile] {label}: {time.perf_counter()-t0:.0f}s", flush=True)
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); run(); ts.append(time.perf_counter()-t0)
    best=min(ts)
    print(f"[bench] {label}: {best*1e3:.0f} ms -> {1024*1024/best/1e6:.2f} Mrays/s", flush=True)

r32, _ = tile_image_rays(rays, 32, 32)
r8x128, _ = tile_image_rays(rays, 8, 128)

opt_on = BVHTraceOptions()
opt_off = BVHTraceOptions(exact_edge_fallback=False)

bench("leaf8 32x32 fb=on", scenes[8], r32, opt_on)
bench("leaf8 8x128 fb=on", scenes[8], r8x128, opt_on)   # same kernel, cache hit
bench("leaf8 32x32 fb=off", scenes[8], r32, opt_off)
bench("leaf4 32x32 fb=on", scenes[4], r32, opt_on)
bench("leaf4 32x32 fb=off", scenes[4], r32, opt_off)
print("DONE", flush=True)

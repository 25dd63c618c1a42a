import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from nanort_tpu import BVHBuildOptions, BVHTraceOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import traverse_bvh8, tile_image_rays
from nanort_tpu.models.cameras import look_at, pinhole_rays

v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
opts = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
bvh, _ = build_triangle_bvh(mesh, opts)
s8 = collapse_bvh8(bvh, v, f)
s8 = s8._replace(nodes=jax.device_put(jnp.asarray(s8.nodes)),
                 leafs=jax.device_put(jnp.asarray(s8.leafs)))
cam = look_at(eye=(0,0,2.2), center=(0,0,0), width=1024, height=1024, fov=60.0)
rays = pinhole_rays(cam)

def bench(label, rays_flat, reps=3, **kw):
    def run():
        h = traverse_bvh8(s8, rays_flat, **kw)
        return float(h.t.min())
    t0=time.perf_counter(); run(); print(f"[compile] {label}: {time.perf_counter()-t0:.0f}s", flush=True)
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); run(); ts.append(time.perf_counter()-t0)
    print(f"[bench] {label}: {min(ts)*1e3:.0f} ms -> {1024*1024/min(ts)/1e6:.2f} Mrays/s", flush=True)

r3264, _ = tile_image_rays(rays, 32, 64)
r32, _ = tile_image_rays(rays, 32, 32)
bench("queue sub=16 32x64 fb=on", r3264, sub=16)
bench("queue sub=8 32x32 fb=on", r32, sub=8)
bench("queue sub=16 32x64 fb=off", r3264, sub=16, options=BVHTraceOptions(exact_edge_fallback=False))
print("DONE", flush=True)

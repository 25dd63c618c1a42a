import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
import jax.tree_util as jtu
from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import tile_image_rays
from nanort_tpu.traverse.ray_sort import traverse_bvh8_sorted
from nanort_tpu.models.cameras import look_at, pinhole_rays

v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
opts = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
bvh, _ = build_triangle_bvh(mesh, opts)
s8 = collapse_bvh8(bvh, v, f)
s8 = s8._replace(nodes=jax.device_put(jnp.asarray(s8.nodes)),
                 leafs=jax.device_put(jnp.asarray(s8.leafs)))
cam = look_at(eye=(0,0,2.2), center=(0,0,0), width=4096, height=4096, fov=60.0)
rays, _ = tile_image_rays(pinhole_rays(cam), 32, 128)
R3 = 4*1024*1024
perm = np.random.default_rng(0).permutation(4096*4096)[:R3]
rays_inc3 = jtu.tree_map(lambda x: jnp.asarray(np.asarray(x)[perm]), rays)
def run():
    h = traverse_bvh8_sorted(s8, rays_inc3, sub=16)
    return float(h.t.min())
run()
ts = []
for _ in range(3):
    t0=time.perf_counter(); run(); ts.append(time.perf_counter()-t0)
print(f"[extra] incoherent 4M rays SORTED -> packet kernel: {min(ts)*1e3:.0f} ms -> {R3/min(ts)/1e6:.2f} Mrays/s", flush=True)

# 10M capacity via wavefront, smaller tile + coarse image
from nanort_tpu.traverse.packed import pack_scene
from nanort_tpu.traverse.wavefront import traverse_wavefront
v10, f10 = make_subdivided_sphere_scene(10_000_000)
mesh10 = TriangleMesh(vertices=v10, faces=f10)
bvh10, st10 = build_triangle_bvh(mesh10, BVHBuildOptions(min_leaf_primitives=16, max_leaf_primitives=16))
sc10 = pack_scene(bvh10, v10, f10)
sc10 = sc10.__class__(jax.device_put(jnp.asarray(sc10.nodes)), jax.device_put(jnp.asarray(sc10.soup)), sc10.num_nodes, sc10.num_prims)
r10 = pinhole_rays(look_at(eye=(0,0,2.2), center=(0,0,0), width=256, height=256, fov=60.0))
t0=time.perf_counter()
h = traverse_wavefront(sc10, r10, max_leaf=16, tile=4096)
res = float(h.t.min()), float(np.asarray(h.hit).mean())
print(f"[extra] 10M-tri wavefront 256^2: first call {time.perf_counter()-t0:.0f}s, hit {res[1]:.3f}", flush=True)
t0=time.perf_counter()
h = traverse_wavefront(sc10, r10, max_leaf=16, tile=4096); float(h.t.min())
print(f"[extra] 10M-tri wavefront 256^2: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

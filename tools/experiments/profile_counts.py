"""Per-packet visit counters for the packet kernel (debug_counts mode):
how many node pops and leaf drains does the 8192^2 megabatch really do?"""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import tile_image_rays, traverse_bvh8
from nanort_tpu.models.cameras import look_at, pinhole_rays

v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
bvh, _ = build_triangle_bvh(mesh, BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8))
s8 = collapse_bvh8(bvh, v, f)
s8 = s8._replace(nodes=jax.device_put(jnp.asarray(s8.nodes)),
                 leafs=jax.device_put(jnp.asarray(s8.leafs)))
res = 8192
cam = look_at(eye=(0,0,2.2), center=(0,0,0), width=res, height=res, fov=60.0)
rays, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
h = traverse_bvh8(s8, rays, debug_counts=True)
nn = np.asarray(h.u.reshape(-1, 32*128)[:, 0])
nl = np.asarray(h.v.reshape(-1, 32*128)[:, 0])
print(f"packets {nn.shape[0]}  node pops: total {nn.sum():.0f} mean {nn.mean():.1f} p50 {np.percentile(nn,50):.0f} p95 {np.percentile(nn,95):.0f} max {nn.max():.0f}")
print(f"               leaf drains: total {nl.sum():.0f} mean {nl.mean():.1f} p50 {np.percentile(nl,50):.0f} p95 {np.percentile(nl,95):.0f} max {nl.max():.0f}")
# cost model vs measured 598 ms: t = Npkt*(overhead) + nn*tau_n + nl*tau_l
print(f"per-packet mean: {nn.mean():.1f} nodes, {nl.mean():.1f} leaves; measured 36.5us/packet")

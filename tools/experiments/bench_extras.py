"""Extra benchmark data: incoherent rays (Pallas kernel) and 10M-tri
capacity (wavefront path)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import traverse_bvh8, tile_image_rays
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.core.ray import Rays

v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
opts = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
bvh, _ = build_triangle_bvh(mesh, opts)
s8 = collapse_bvh8(bvh, v, f)
s8 = s8._replace(nodes=jax.device_put(jnp.asarray(s8.nodes)),
                 leafs=jax.device_put(jnp.asarray(s8.leafs)))

cam = look_at(eye=(0,0,2.2), center=(0,0,0), width=4096, height=4096, fov=60.0)
rays, _ = tile_image_rays(pinhole_rays(cam), 32, 128)
R = 4096*4096

# incoherent: globally shuffle the coherent set (worst-case packet mix)
perm = np.random.default_rng(0).permutation(R)
import jax.tree_util as jtu
rays_inc = jtu.tree_map(lambda x: jnp.asarray(np.asarray(x)[perm]), rays)

def bench(label, rr, reps=3):
    def run():
        h = traverse_bvh8(s8, rr, sub=16)
        return float(h.t.min())
    run()
    ts = []
    for _ in range(reps):
        t0=time.perf_counter(); run(); ts.append(time.perf_counter()-t0)
    print(f"[extra] {label}: {min(ts)*1e3:.0f} ms -> {R/min(ts)/1e6:.2f} Mrays/s", flush=True)

bench("coherent 4096^2 (pallas packet)", rays)

# Incoherent rays are pathological for packet traversal (each packet's
# union covers the whole tree -> minutes per batch and a watchdog kill);
# the per-ray wavefront path is the right engine for them.
from nanort_tpu.traverse.packed import pack_scene
from nanort_tpu.traverse.wavefront import traverse_wavefront
sc = pack_scene(bvh, v, f)
sc = sc.__class__(jax.device_put(jnp.asarray(sc.nodes)), jax.device_put(jnp.asarray(sc.soup)), sc.num_nodes, sc.num_prims)
R2 = 1024*1024
rays_inc2 = jtu.tree_map(lambda x: jnp.asarray(np.asarray(x)[perm[:R2]]), rays)
def bench_wf(label, rr, reps=3):
    def run():
        h = traverse_wavefront(sc, rr, max_leaf=8, tile=4096)
        return float(h.t.min())
    run()
    ts = []
    for _ in range(reps):
        t0=time.perf_counter(); run(); ts.append(time.perf_counter()-t0)
    print(f"[extra] {label}: {min(ts)*1e3:.0f} ms -> {R2/min(ts)/1e6:.2f} Mrays/s", flush=True)
rays_coh2 = jtu.tree_map(lambda x: x[:R2], rays)
bench_wf("coherent 1M rays (wavefront)", rays_coh2)
bench_wf("incoherent 1M rays (wavefront)", rays_inc2)

# 10M-tri capacity via the wavefront (HBM) path
from nanort_tpu.traverse.packed import pack_scene
from nanort_tpu.traverse.wavefront import traverse_wavefront
v10, f10 = make_subdivided_sphere_scene(10_000_000)
mesh10 = TriangleMesh(vertices=v10, faces=f10)
t0 = time.perf_counter()
bvh10, st10 = build_triangle_bvh(mesh10, BVHBuildOptions(min_leaf_primitives=16, max_leaf_primitives=16))
print(f"[extra] 10M-tri native build: {time.perf_counter()-t0:.1f}s, depth {st10.max_tree_depth}", flush=True)
sc10 = pack_scene(bvh10, v10, f10)
sc10 = sc10.__class__(jax.device_put(jnp.asarray(sc10.nodes)), jax.device_put(jnp.asarray(sc10.soup)), sc10.num_nodes, sc10.num_prims)
cam10 = look_at(eye=(0,0,2.2), center=(0,0,0), width=512, height=512, fov=60.0)
r10 = pinhole_rays(cam10)
def run10():
    h = traverse_wavefront(sc10, r10, max_leaf=16, tile=4096)
    return float(h.t.min()), float(np.asarray(h.hit).mean())
t0=time.perf_counter(); _, frac = run10(); print(f"[extra] 10M wavefront first call: {time.perf_counter()-t0:.0f}s, hit {frac:.3f}", flush=True)
t0=time.perf_counter(); run10(); dt=time.perf_counter()-t0
print(f"[extra] 10M-tri wavefront 512^2: {dt*1e3:.0f} ms -> {512*512/dt/1e6:.2f} Mrays/s", flush=True)

# sorted incoherent rays through the packet kernel
from nanort_tpu.traverse.ray_sort import traverse_bvh8_sorted
R3 = 4*1024*1024
rays_inc3 = jtu.tree_map(lambda x: jnp.asarray(np.asarray(x)[perm[:R3]]), rays)
def bench_sorted(label, rr, reps=3):
    def run():
        h = traverse_bvh8_sorted(s8, rr, sub=16)
        return float(h.t.min())
    run()
    ts = []
    for _ in range(reps):
        t0=time.perf_counter(); run(); ts.append(time.perf_counter()-t0)
    print(f"[extra] {label}: {min(ts)*1e3:.0f} ms -> {R3/min(ts)/1e6:.2f} Mrays/s", flush=True)
bench_sorted("incoherent 4M rays, SORTED -> packet kernel", rays_inc3)

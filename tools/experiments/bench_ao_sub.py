import sys, time, functools
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.models.objrender import render_ao
from nanort_tpu.traverse import pallas_packet as pp

v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
opts = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
bvh, _ = build_triangle_bvh(mesh, opts)
s8 = collapse_bvh8(bvh, v, f)
s8 = s8._replace(nodes=jax.device_put(jnp.asarray(s8.nodes)),
                 leafs=jax.device_put(jnp.asarray(s8.leafs)))
res = 2048
cam = look_at(eye=(0,0,2.2), center=(0,0,0), width=res, height=res, fov=60.0)
rays = pinhole_rays(cam)
key = jax.random.PRNGKey(0)

orig = pp.traverse_bvh8
for sub in (8, 16, 32):
    pp.traverse_bvh8 = functools.partial(orig, sub=sub)
    jax.clear_caches()
    def run():
        aovs, _ = render_ao(bvh, mesh, rays, key, n_samples=4, scene8=s8)
        return float(aovs["ao"].sum())
    t0 = time.perf_counter(); val = run()
    print(f"sub={sub} first call {time.perf_counter()-t0:.1f}s ao_sum={val:.1f}")
    ts = []
    for _ in range(2):
        t0 = time.perf_counter(); run(); ts.append(time.perf_counter()-t0)
    total_rays = res*res*(1+4)
    best = min(ts)
    print(f"sub={sub}: {best*1e3:.0f} ms -> {total_rays/best/1e6:.2f} Mrays/s (primary+4 AO)")

"""A/B the frustum scalar node phase + quad-pop vs dual-pop on the bench
scene, with device-side correctness checks vs the per-ray vote kernel.
Run on real TPU: nohup python tools/profile_frustum.py > /tmp/frustum.log &"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import tile_image_rays, traverse_bvh8

res = 8192
v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
bvh, _ = build_triangle_bvh(
    mesh, BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
)
s8 = collapse_bvh8(bvh, v, f)
s8 = s8._replace(
    nodes=jax.device_put(jnp.asarray(s8.nodes)),
    leafs=jax.device_put(jnp.asarray(s8.leafs)),
)
cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
              width=res, height=res, fov=60.0)
rays, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
n_rays = res * res

VARIANTS = [
    ("dual", dict(frustum=False)),  # current default (pop_n=2)
    ("quad", dict(frustum=False, pop_n=4)),
    ("fru_t2", dict(frustum=True, t_sync_every=2)),
    ("fru_t1", dict(frustum=True, t_sync_every=1)),
    ("fru_t4", dict(frustum=True, t_sync_every=4)),
]

results = {}
for name, kw in VARIANTS:
    t0 = time.perf_counter()
    try:
        h0 = traverse_bvh8(s8, rays, **kw)
        float(h0.t.min())
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        continue
    print(f"{name}: first {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        h = traverse_bvh8(s8, rays, **kw)
        float(h.t.min())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: best {min(ts)*1e3:.1f} ms -> "
          f"{n_rays/min(ts)/1e6:.1f} Mrays/s", flush=True)
    results[name] = h0

if "dual" in results:
    a = results["dual"]
    for name in results:
        if name == "dual":
            continue
        b = results[name]
        # device-side diffs (full readback is ~1GB through the tunnel)
        t_diff = int(jnp.sum(
            jnp.abs(jnp.nan_to_num(a.t, posinf=1e30)
                    - jnp.nan_to_num(b.t, posinf=1e30))
            > 1e-5 * jnp.maximum(1.0, jnp.abs(jnp.nan_to_num(a.t)))
        ))
        pid_diff = int(jnp.sum(a.prim_id != b.prim_id))
        print(f"{name} vs dual: t diffs {t_diff}, prim diffs {pid_diff} "
              f"(equal-t ties are legal)", flush=True)

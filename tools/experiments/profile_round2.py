"""Round-2 tuning sweep on the bench scene: visit counters for dual vs
frustum, drain batching (lq_cap), packet sizes. Run on real TPU."""
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
rays128, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
rays64, _ = tile_image_rays(pinhole_rays(cam), 64, 64)  # sub=16: 64x32? no:
# 64x64 tile = 4096 px; sub=16 packet = 2048 rays -> half a tile each,
# 64x32-ish footprint. Good enough for the sweep.
n_rays = res * res

VARIANTS = [
    ("dual_counts", rays128, dict(frustum=False, debug_counts=True)),
    ("fru_counts", rays128, dict(frustum=True, t_sync_every=2,
                                 debug_counts=True)),
    ("dual_lq2", rays128, dict(frustum=False, lq_cap=2)),
    ("dual_lq4", rays128, dict(frustum=False, lq_cap=4)),
    ("dual_sub64", rays128, dict(frustum=False, sub=64)),
    ("fru16_t2", rays64, dict(frustum=True, t_sync_every=2, sub=16)),
]

for name, rr, kw in VARIANTS:
    t0 = time.perf_counter()
    try:
        h0 = traverse_bvh8(s8, rr, **kw)
        float(h0.t.min())
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        time.sleep(150)  # worker recovery before the next variant
        continue
    print(f"{name}: first {time.perf_counter()-t0:.0f}s", flush=True)
    if kw.get("debug_counts"):
        print(f"{name}: pops/packet {float(h0.u.mean()):.2f} "
              f"drains {float(h0.v.mean()):.2f}", flush=True)
        continue
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        h = traverse_bvh8(s8, rr, **kw)
        float(h.t.min())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: best {min(ts)*1e3:.1f} ms -> "
          f"{n_rays/min(ts)/1e6:.1f} Mrays/s", flush=True)

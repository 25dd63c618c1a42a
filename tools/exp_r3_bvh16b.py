"""BVH16 fault isolation: pop_n=1 (ONE (2,128) dynamic fetch per step),
100K-tri scene first, then 1M. Run in a FRESH process."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def log(m): print(m, file=sys.stderr, flush=True)

def main():
    import jax, jax.numpy as jnp
    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh16
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization, tile_image_rays, traverse_bvh8)

    for n_tris, res in ((100_000, 2048), (1_000_000, 8192)):
        v, f = make_subdivided_sphere_scene(n_tris)
        mesh = TriangleMesh(vertices=v, faces=f)
        bvh, _ = build_triangle_bvh(
            mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
        s16 = collapse_bvh16(bvh, v, f)
        s16 = s16._replace(nodes=jax.device_put(jnp.asarray(s16.nodes)),
                           leafs=jax.device_put(jnp.asarray(s16.leafs)))
        cam = look_at(eye=(0., 0., 2.2), center=(0., 0., 0.),
                      width=res, height=res, fov=60.0)
        rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
        spec = detect_specialization(rays_t)
        for pop in (1, 2):
            name = f"wt16_pop{pop}_{n_tris//1000}k"
            try:
                t0 = time.perf_counter()
                h = traverse_bvh8(s16, rays_t, specialize=spec, pop_n=pop)
                hf = float((h.prim_id != jnp.uint32(0xFFFFFFFF)).mean())
                log(f"{name}: first {time.perf_counter()-t0:.0f}s hitfrac {hf:.3f}")
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    h = traverse_bvh8(s16, rays_t, specialize=spec, pop_n=pop)
                    _ = float(h.t.min())
                    ts.append(time.perf_counter() - t0)
                log(f"{name}: {res*res/min(ts)/1e6:.1f} Mrays/s")
            except Exception as e:
                log(f"{name} FAILED {type(e).__name__}: {str(e)[:200]}")
                return  # poisoned; stop

if __name__ == "__main__":
    main()

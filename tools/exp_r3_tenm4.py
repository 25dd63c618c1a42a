"""10M follow-up: ray-density & packet-size sweep (leaf-compute bound:
183 drains x 9 tris per 4096-ray packet at res 4096 — packets span too
much geometry; denser rays / smaller packets tighten unions)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def log(m): print(m, file=sys.stderr, flush=True)

def main():
    import jax, jax.numpy as jnp
    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization, tile_image_rays, traverse_bvh8)

    v, f = make_subdivided_sphere_scene(10_000_000)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
    s8 = collapse_bvh8(bvh, v, f)
    log(f"{s8.num_nodes} nodes {s8.num_leaf_rows} rows")
    s8 = s8._replace(nodes=jax.device_put(jnp.asarray(s8.nodes)),
                     leafs=jax.device_put(jnp.asarray(s8.leafs)))
    # tiny canary first (worker-recovery detection)
    from nanort_tpu.io.procedural import make_cornell_box
    cv, cf = make_cornell_box(2.0)
    cb, _ = build_triangle_bvh(
        TriangleMesh(vertices=cv, faces=cf),
        BVHBuildOptions(min_leaf_primitives=4, max_leaf_primitives=4))
    cs8 = collapse_bvh8(cb, cv, cf)
    cs8 = cs8._replace(nodes=jnp.asarray(cs8.nodes), leafs=jnp.asarray(cs8.leafs))
    ccam = look_at(eye=(0., 0., 5.), center=(0., 0., 0.), width=64, height=64, fov=45.)
    crays, _ = tile_image_rays(pinhole_rays(ccam), 64, 64)
    for attempt in range(4):
        try:
            hc = traverse_bvh8(cs8, crays, sub=8)
            log(f"canary ok: {float(hc.t.min()):.3f}")
            break
        except Exception as e:
            log(f"canary failed {type(e).__name__}; sleep 150"); time.sleep(150)
    else:
        return
    for res, sub, tile in ((8192, 32, (128, 64)), (8192, 16, (128, 32)),
                           (4096, 16, (128, 32)), (4096, 8, (64, 32))):
        cam = look_at(eye=(0., 0., 2.2), center=(0., 0., 0.),
                      width=res, height=res, fov=60.0)
        rays_t, _ = tile_image_rays(pinhole_rays(cam), *tile)
        spec = detect_specialization(rays_t)
        name = f"r{res}_sub{sub}"
        try:
            t0 = time.perf_counter()
            h = traverse_bvh8(s8, rays_t, specialize=spec, sub=sub)
            _ = float(h.t.min())
            log(f"{name} first {time.perf_counter()-t0:.0f}s")
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                h = traverse_bvh8(s8, rays_t, specialize=spec, sub=sub)
                _ = float(h.t.min())
                ts.append(time.perf_counter() - t0)
            log(f"{name}: {res*res/min(ts)/1e6:.2f} Mrays/s "
                f"({[round(x*1e3) for x in ts]} ms)")
        except Exception as e:
            log(f"{name} FAILED {type(e).__name__}: {str(e)[:200]}")
            time.sleep(150)

if __name__ == "__main__":
    main()

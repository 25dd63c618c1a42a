"""End-to-end verification on the real TPU: drive the public API —
procedural scene -> BVH build -> stack + packet traversal -> AO render
-> fused path-traced render — and print PASS/FAIL per stage.

This is the /verify recipe (.claude/skills/verify/SKILL.md) in script
form so it can run inside the serialized TPU queue.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import nanort_tpu as nrt
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import (
        make_cornell_box, make_cornell_pt_scene, make_uv_sphere, merge_meshes,
    )
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.objrender import render_ao
    from nanort_tpu.models.path_tracer import make_pt_scene, render_path_traced
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import detect_specialization

    print("backend:", jax.default_backend(), flush=True)

    # 1. scene + build + plain traversal
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(32, 64, 0.6))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, stats = nrt.build_triangle_bvh(mesh)
    cam = look_at(eye=(0, 0, 5.0), center=(0, 0, 0),
                  width=64, height=64, fov=45.0)
    rays = pinhole_rays(cam)
    hits = nrt.traverse_triangles(bvh, mesh, rays)
    hf = float(jnp.mean(hits.hit.astype(jnp.float32)))
    print(f"stack traverse: hit_frac={hf:.3f}", flush=True)
    # the box+sphere fills ~1/3 of this framing; just require substance
    assert 0.2 < hf <= 1.0

    # 2. packet kernel (the bench engine) on the same rays
    s8 = collapse_bvh8(bvh, v, f, width=16)
    s8 = s8._replace(nodes=jnp.asarray(s8.nodes), leafs=jnp.asarray(s8.leafs))
    from nanort_tpu.traverse.pallas_packet import tile_image_rays, traverse_bvh8
    rays_t, untile = tile_image_rays(rays, 64, 64)
    spec = detect_specialization(rays_t)
    h8 = untile(traverse_bvh8(s8, rays_t, specialize=spec))
    p_ref = np.asarray(hits.prim_id)
    p_pk = np.asarray(h8.prim_id)
    t_ref = np.asarray(hits.t)
    t_pk = np.asarray(h8.t)
    same_hit = (np.asarray(h8.hit) == np.asarray(hits.hit)).all()
    diff = p_pk != p_ref
    agree = 1.0 - diff.sum() / p_ref.size
    # prim ids may differ ONLY at (near-)equal t: engines resolve
    # equal-t ties differently by contract (CLAUDE.md invariants)
    t_where_diff_close = np.allclose(
        t_pk[diff], t_ref[diff], rtol=1e-5, atol=1e-6)
    print(f"packet kernel: prim agreement {agree:.4f}, hitmask_eq "
          f"{same_hit}, tie_t_close {t_where_diff_close}", flush=True)
    assert same_hit and agree > 0.99 and t_where_diff_close

    # 3. AO render (config-A shape, small)
    aovs, _ = render_ao(bvh, mesh, rays, jax.random.PRNGKey(0),
                        n_samples=4, scene8=s8, specialize=spec)
    ao = np.asarray(aovs["ao"])
    print(f"AO: mean={ao.mean():.3f} nan={np.isnan(ao).sum()}", flush=True)
    assert not np.isnan(ao).any() and 0.05 < ao.mean() < 1.0

    # 4. fused path-traced render on TPU (the new megakernel)
    sv, sf, mids, mats = make_cornell_pt_scene(2.0)
    pts = make_pt_scene(sv, sf, mids, mats)
    pcam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                   width=64, height=64, fov=45.0)
    t0 = time.perf_counter()
    img = render_path_traced(pts, pinhole_rays(pcam), jax.random.PRNGKey(1),
                             spp=16, max_bounces=6, fused=True)
    img = np.asarray(img)
    print(f"fused PT: {time.perf_counter()-t0:.1f}s mean={img.mean():.4f} "
          f"nan={np.isnan(img).sum()}", flush=True)
    assert not np.isnan(img).any() and img.mean() > 0.01

    # 5. XLA megabatch PT path still agrees
    img2 = np.asarray(render_path_traced(
        pts, pinhole_rays(pcam), jax.random.PRNGKey(1), spp=16,
        max_bounces=6, fused=False))
    rel = abs(img.mean() - img2.mean()) / max(img2.mean(), 1e-9)
    print(f"fused vs XLA mean rel diff: {rel:.4f}", flush=True)
    assert rel < 0.1

    print("VERIFY PASS", flush=True)


if __name__ == "__main__":
    main()

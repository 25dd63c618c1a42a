"""r4 wave 1: fused BVH-traced path tracer on the config-B protocol
scene (cornellbox_suzanne.obj, 974 faces, group-mapped lucy materials).

Probes the Mosaic compile first on a small image, sanity-checks the
image against the XLA megabatch path at low spp, then times the full
config B (512^2 x 100 spp x <=10 bounces) across block sizes and pixel
orders. Run on TPU: nohup python tools/exp_r4_ptbvh.py > \
tools/logs/exp_r4_ptbvh.out 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES = int(os.environ.get("R4_RES", 512))
SPP = int(os.environ.get("R4_SPP", 100))

OUT = {}


def emit(k, v):
    OUT[k] = v
    print(json.dumps(OUT), flush=True)


def tile_flat(org, dirs, H, W, th, tw):
    """Image-order -> th x tw pixel tiles (and the inverse permutation)."""
    idx = np.arange(H * W).reshape(H, W)
    idx = (idx.reshape(H // th, th, W // tw, tw)
           .transpose(0, 2, 1, 3).reshape(-1))
    inv = np.argsort(idx)
    return org[idx], dirs[idx], inv


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu.io.obj import (
        CORNELL_GROUP_MATERIALS,
        load_obj,
        remap_materials_by_object,
    )
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.path_tracer import make_pt_scene
    from nanort_tpu.models.pt_fused import (
        fused_bvh_eligible,
        render_fused_bvh,
    )

    m = load_obj("/root/reference/examples/common/cornellbox_suzanne.obj")
    m = remap_materials_by_object(m, CORNELL_GROUP_MATERIALS)
    emit("faces", int(len(m.faces)))
    emit("n_lights_faces", int((m.materials["emission"][m.material_ids]
                                .sum(-1) > 0).sum()))
    scene = make_pt_scene(m.vertices, m.faces, m.material_ids,
                          m.materials, engine="pallas")
    emit("eligible", bool(fused_bvh_eligible(scene)))
    emit("leaf_rows", int(scene.scene8.leafs.shape[0]))
    emit("depth", int(scene.scene8.depth))

    # camera: inside-the-box view like the reference example
    # (path_tracer/main.cc look: eye on +z outside the open face)
    bmin = np.asarray(m.vertices).min(0)
    bmax = np.asarray(m.vertices).max(0)
    center = (bmin + bmax) / 2
    eye = center + np.asarray([0, 0, 2.5 * (bmax - bmin).max()])
    key = jax.random.PRNGKey(3)

    # ---- compile probe: 64x64, spp/bounces traced (same kernel) ----
    cam_s = look_at(eye=tuple(eye), center=tuple(center),
                    width=64, height=64, fov=45.0)
    pr = pinhole_rays(cam_s)
    org_s = np.asarray(pr.org.reshape(-1, 3))
    dir_s = np.asarray(pr.dir.reshape(-1, 3))
    t0 = time.perf_counter()
    img = render_fused_bvh(scene, org_s, dir_s, key, 2, max_bounces=10)
    emit("probe_mean", float(np.asarray(img).mean()))
    emit("probe_compile_s", round(time.perf_counter() - t0, 1))

    # sanity vs the XLA megabatch path (same estimator, different RNG)
    from nanort_tpu.models.path_tracer import trace_paths
    spp_chk = 32
    oa = jnp.broadcast_to(jnp.asarray(org_s)[None], (spp_chk,) + org_s.shape
                          ).reshape(-1, 3)
    da = jnp.broadcast_to(jnp.asarray(dir_s)[None], (spp_chk,) + dir_s.shape
                          ).reshape(-1, 3)
    cx = np.asarray(trace_paths(scene, oa, da, key, max_bounces=10)
                    ).reshape(spp_chk, -1, 3).mean(0)
    cf = np.asarray(render_fused_bvh(scene, org_s, dir_s, key, spp_chk,
                                     max_bounces=10))
    emit("xla_mean", float(cx.mean()))
    emit("fused_mean", float(cf.mean()))
    emit("mean_rel_err", round(abs(float(cf.mean() - cx.mean()))
                               / max(float(cx.mean()), 1e-9), 4))

    # ---- config B timing ----
    cam = look_at(eye=tuple(eye), center=tuple(center),
                  width=RES, height=RES, fov=45.0)
    pr = pinhole_rays(cam)
    org = np.asarray(pr.org.reshape(-1, 3))
    dirs = np.asarray(pr.dir.reshape(-1, 3))

    for name, sub, tiled in (("sub16_strip", 16, None),
                             ("sub16_t16x128", 16, (16, 128)),
                             ("sub8_t8x128", 8, (8, 128)),
                             ("sub32_t32x128", 32, (32, 128))):
        if tiled:
            o2, d2, _ = tile_flat(org, dirs, RES, RES, *tiled)
        else:
            o2, d2 = org, dirs
        try:
            t0 = time.perf_counter()
            img = render_fused_bvh(scene, o2, d2, key, 1,
                                   max_bounces=10, sub=sub)
            float(np.asarray(img).mean())
            emit(f"{name}_warm_s", round(time.perf_counter() - t0, 1))
            t0 = time.perf_counter()
            img = render_fused_bvh(scene, o2, d2, key, SPP,
                                   max_bounces=10, sub=sub)
            mn = float(np.asarray(img).mean())
            dur = time.perf_counter() - t0
            emit(f"{name}_configB_s", round(dur, 2))
            emit(f"{name}_msamples_s",
                 round(RES * RES * SPP / dur / 1e6, 1))
            emit(f"{name}_mean", round(mn, 5))
        except Exception as e:  # noqa: BLE001
            emit(f"{name}_err", f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()

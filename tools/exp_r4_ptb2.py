"""r4 wave 7: config-B fused-BVH PT — block-shared azimuth wedge
stratification (VERDICT r3 #2 follow-through; 2.50 s on the protocol
scene, bar is 2.0).

Hypothesis: the per-bounce cost is dominated by the shared-stack
traversal union of a block whose diffuse directions span the whole
hemisphere. Giving every lane of a (sample, bounce) the SAME azimuth
wedge (wedge cycles with the sample index -> per-pixel marginal stays
uniform/stratified, unbiased) should shrink the union like the AO
stratification did (124 -> 93 ms, exp_r4_aostrat).

Also records the per-bounce cost slope (max_bounces 2/5/10 at spp=20).

Run: nohup python tools/exp_r4_ptb2.py > tools/logs/exp_r4_ptb2.out 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = {}


def emit(k, v):
    OUT[k] = v
    print(json.dumps(OUT), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu.io.obj import (
        CORNELL_GROUP_MATERIALS, load_obj, remap_materials_by_object,
    )
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.path_tracer import make_pt_scene
    from nanort_tpu.models.pt_fused import render_fused_bvh

    obj_path = "/root/reference/examples/common/cornellbox_suzanne.obj"
    m = load_obj(obj_path)
    m = remap_materials_by_object(m, CORNELL_GROUP_MATERIALS)
    pts = make_pt_scene(m.vertices, m.faces, m.material_ids, m.materials,
                        engine="pallas")
    emit("faces", int(np.asarray(m.faces).shape[0]))
    sv = np.asarray(m.vertices)
    bmin, bmax = sv.min(0), sv.max(0)
    ctr = (bmin + bmax) / 2
    eye = tuple(ctr + np.asarray([0, 0, 2.5 * (bmax - bmin).max()]))
    cam = look_at(eye=eye, center=tuple(ctr), width=512, height=512,
                  fov=45.0)
    rays = pinhole_rays(cam)
    key = jax.random.PRNGKey(3)

    # 32x128 pixel tiling, as render_path_traced's fused-BVH routing does
    H = W = 512
    sub = 32
    idx = np.arange(H * W).reshape(H // sub, sub, W // 128, 128)
    perm = jnp.asarray(idx.transpose(0, 2, 1, 3).reshape(-1))
    org = jnp.asarray(rays.org.reshape(-1, 3))[perm]
    d = jnp.asarray(rays.dir.reshape(-1, 3))[perm]

    def run(tag, spp, bounces, az):
        try:
            t0 = time.perf_counter()
            img = render_fused_bvh(pts, org, d, key, spp,
                                   max_bounces=bounces, sub=sub,
                                   azimuth_strata=az)
            mean = float(img.mean())
            first = time.perf_counter() - t0
            t0 = time.perf_counter()
            img = render_fused_bvh(pts, org, d, key, spp,
                                   max_bounces=bounces, sub=sub,
                                   azimuth_strata=az)
            float(img.mean())
            emit(tag + "_s", round(time.perf_counter() - t0, 2))
            emit(tag + "_first_s", round(first, 1))
            emit(tag + "_mean", round(mean, 5))
        except Exception as e:  # noqa: BLE001
            emit(tag + "_err", f"{type(e).__name__}: {e}"[:160])
            time.sleep(130)

    run("configB_az1", 100, 10, 1)
    run("configB_az8", 100, 10, 8)
    run("configB_az4", 100, 10, 4)
    for b in (2, 5):
        run(f"b{b}_az1", 20, b, 1)
        run(f"b{b}_az8", 20, b, 8)


if __name__ == "__main__":
    main()

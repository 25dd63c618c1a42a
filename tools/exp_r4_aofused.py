"""r4 wave 1b: fused AO megakernel on the config-A scene (cornell +
16K-tri uv sphere, BASELINE.md row objrender_ao_512).

Times render_ao_fused across block sizes against the shipped recipe
(render_ao via packet kernels, r3: 201 ms) and bit-compares the AO
image + primary records on TPU, where both paths execute the same
Mosaic leaf arithmetic. Run: nohup python tools/exp_r4_aofused.py > \
tools/logs/exp_r4_aofused.out 2>&1 &
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

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import (
        make_cornell_box,
        make_uv_sphere,
        merge_meshes,
    )
    from nanort_tpu.models.ao_fused import build_ao_aux, render_ao_fused
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.objrender import render_ao
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import detect_specialization

    opt8 = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(64, 128, 0.6))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh, opt8)
    s8 = collapse_bvh8(bvh, v, f, width=16)
    aux = build_ao_aux(mesh, s8)
    s8d = s8._replace(nodes=jnp.asarray(s8.nodes),
                      leafs=jnp.asarray(s8.leafs))
    emit("tris", int(len(f)))
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=512, height=512, fov=45.0)
    rays = pinhole_rays(cam)
    key = jax.random.PRNGKey(7)
    spec_a = detect_specialization(rays)

    def run_shipped():
        aovs, hits = render_ao(bvh, mesh, rays, key, n_samples=8,
                               max_leaf=8, scene8=s8d, specialize=spec_a,
                               octant_major=True, sub=8)
        return float(np.asarray(aovs["ao"]).min()), aovs, hits

    t0 = time.perf_counter()
    _, aovs_ref, hits_ref = run_shipped()
    emit("shipped_first_s", round(time.perf_counter() - t0, 1))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_shipped()
        ts.append(time.perf_counter() - t0)
    emit("shipped_ms", round(min(ts) * 1e3))

    for sub in (8, 16, 32):
        def run_f():
            aovs, hits = render_ao_fused(mesh, rays, key, s8d, aux,
                                         n_samples=8, sub=sub)
            return float(np.asarray(aovs["ao"]).min()), aovs, hits

        try:
            t0 = time.perf_counter()
            _, aovs_f, hits_f = run_f()
            emit(f"fused_sub{sub}_first_s",
                 round(time.perf_counter() - t0, 1))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                run_f()
                ts.append(time.perf_counter() - t0)
            emit(f"fused_sub{sub}_ms", round(min(ts) * 1e3))
        except Exception as e:  # noqa: BLE001
            emit(f"fused_sub{sub}_err", f"{type(e).__name__}: {e}"[:300])
            continue

        if sub == 8:
            ao_r = np.asarray(aovs_ref["ao"])
            ao_f = np.asarray(aovs_f["ao"])
            emit("ao_diff_count", int((ao_r != ao_f).sum()))
            pr = np.asarray(hits_ref.prim_id)
            pf = np.asarray(hits_f.prim_id)
            hitm = np.asarray(aovs_ref["hit"])
            emit("prim_diff_count", int(((pr != pf) & hitm).sum()))
            tr = np.asarray(hits_ref.t)
            tf = np.asarray(hits_f.t)
            samep = (pr == pf) & hitm
            emit("t_bitdiff_count_sameprim",
                 int((tr[samep] != tf[samep]).sum()))
            ties = hitm & (pr != pf)
            emit("tie_t_equal", bool((tr[ties] == tf[ties]).all())
                 if ties.any() else True)


if __name__ == "__main__":
    main()

"""Round-3: config B (path tracer 512^2 x 100 spp, Cornell) after the
face/light shading tables (one-hot MXU lookups replace ~13 per-ray
gather fees per bounce) + brute-force small-scene trace.

Also re-times the megabatch bounce marginal for the stage ledger.

Run: nohup python tools/exp_r3_configB.py > tools/logs/exp_r3_configB.out 2> tools/logs/exp_r3_configB.log &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


RES = {}


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu.io.procedural import make_cornell_pt_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.path_tracer import (
        make_pt_scene, render_path_traced, trace_paths,
    )

    sv, sf, mids, mats = make_cornell_pt_scene(2.0)
    pts = make_pt_scene(sv, sf, mids, mats)
    log(f"face_table: {None if pts.face_table is None else pts.face_table.shape}")
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=512, height=512, fov=45.0)
    prays = pinhole_rays(cam)
    org = prays.org.reshape(-1, 3)
    d = prays.dir.reshape(-1, 3)
    R = org.shape[0]
    n = 25
    org_all = jnp.broadcast_to(org[None], (n, R, 3)).reshape(-1, 3)
    dir_all = jnp.broadcast_to(d[None], (n, R, 3)).reshape(-1, 3)
    jax.block_until_ready(org_all)
    pkey = jax.random.PRNGKey(3)

    prev = prev_mb = None
    for mb in (1, 10):
        def run():
            c = trace_paths(pts, org_all, dir_all, pkey, max_bounces=mb)
            return float(c.min())

        run()
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        RES[f"pt_table_b{mb}_ms"] = round(t * 1e3)
        log(f"pt_table_b{mb}_ms: {round(t*1e3)} {[round(x*1e3) for x in ts]}")
        print(json.dumps(RES), flush=True)
        if prev is not None:
            RES["pt_marginal_bounce_ms"] = round((t - prev) / (mb - prev_mb) * 1e3)
            log(f"  marginal per bounce: {RES['pt_marginal_bounce_ms']} ms")
        prev, prev_mb = t, mb

    def run_full():
        img = render_path_traced(pts, prays, pkey, spp=100, max_bounces=10,
                                 spp_batch=25)
        return float(np.asarray(img.mean()))

    run_full()  # warm
    t0 = time.perf_counter()
    s_val = run_full()
    dur = time.perf_counter() - t0
    RES["configB_s"] = round(dur, 2)
    RES["configB_msamples_per_s"] = round(512 * 512 * 100 / dur / 1e6, 2)
    log(f"configB 512^2 x100spp: {dur:.2f}s mean={s_val:.4f}")
    print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(f"FATAL {type(e).__name__}: {e}")
        raise

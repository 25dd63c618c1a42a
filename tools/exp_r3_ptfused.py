"""Round-3: the fused path-tracer megakernel (models/pt_fused.py) on
real TPU — config B (512^2 x 100 spp, Cornell) in ONE pallas_call.

Measures: compile time, steady-state config-B wall time, Msamples/s,
and a correctness cross-check (global mean vs the XLA megabatch path at
25 spp). Tries trig="native" (jnp.sin/cos in Mosaic) first and falls
back to the polynomial if the compile fails.

Run: nohup python tools/exp_r3_ptfused.py > tools/logs/exp_r3_ptfused.out 2> tools/logs/exp_r3_ptfused.log &
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


def emit(tag, val):
    RES[tag] = val
    log(f"{tag}: {val}")
    print(json.dumps(RES), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu.io.procedural import make_cornell_pt_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.path_tracer import make_pt_scene, trace_paths
    from nanort_tpu.models.pt_fused import render_fused

    sv, sf, mids, mats = make_cornell_pt_scene(2.0)
    pts = make_pt_scene(sv, sf, mids, mats)
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=512, height=512, fov=45.0)
    pr = pinhole_rays(cam)
    org = pr.org.reshape(-1, 3)
    d = pr.dir.reshape(-1, 3)
    R = org.shape[0]

    trig = "native"
    # small compile probe first (spp=1) so a trig failure is cheap
    for attempt in ("native", "poly"):
        try:
            t0 = time.perf_counter()
            c = render_fused(pts, org, d, 7, 1, max_bounces=8,
                             trig=attempt, interpret=False)
            float(np.asarray(c).min())
            emit(f"compile_{attempt}_s", round(time.perf_counter() - t0, 1))
            trig = attempt
            break
        except Exception as e:
            emit(f"compile_{attempt}_err", f"{type(e).__name__}: {e}"[:200])
    else:
        log("both trig modes failed; aborting")
        return

    # ---- config B: 100 spp x 8 bounces, one kernel ----
    def run(spp):
        c = render_fused(pts, org, d, 7, spp, max_bounces=8, trig=trig,
                         interpret=False)
        arr = np.asarray(c)
        return arr

    t0 = time.perf_counter()
    img = run(100)
    emit("configB_first_s", round(time.perf_counter() - t0, 2))
    for rep in range(2):
        t0 = time.perf_counter()
        img = run(100)
        dt = time.perf_counter() - t0
        emit(f"configB_s_rep{rep}", round(dt, 3))
    emit("configB_msamples_per_s", round(R * 100 / dt / 1e6, 2))
    emit("img_mean", round(float(img.mean()), 5))
    emit("img_nan", int(np.isnan(img).sum()))

    # ---- cross-check vs the XLA megabatch path (25 spp each) ----
    n = 25
    oa = jnp.broadcast_to(jnp.asarray(org)[None], (n, R, 3)).reshape(-1, 3)
    da = jnp.broadcast_to(jnp.asarray(d)[None], (n, R, 3)).reshape(-1, 3)
    cx = np.asarray(trace_paths(pts, oa, da, jax.random.PRNGKey(5),
                                max_bounces=8)).reshape(n, R, 3).mean(0)
    emit("xla25_mean", round(float(cx.mean()), 5))
    rel = abs(float(img.mean()) - float(cx.mean())) / max(float(cx.mean()), 1e-9)
    emit("rel_mean_diff", round(rel, 4))

    # ---- spp scaling (is it compute-bound?) ----
    for spp in (25, 400):
        try:
            run(spp)
            t0 = time.perf_counter()
            run(spp)
            emit(f"spp{spp}_s", round(time.perf_counter() - t0, 3))
        except Exception as e:
            emit(f"spp{spp}_err", f"{type(e).__name__}"[:80])


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(f"FATAL {type(e).__name__}: {e}")
        raise

"""Standalone 10M fully-on-device build rows (subprocess of
bench_matrix.py's tenm section).

Runs in its OWN process so a RESOURCE_EXHAUSTED here cannot poison the
parent's allocator: in matrix_r5_tenm3/4 the failed in-process device
attempts left HBM in a state where even the host-build row's ~1.3 GB
device_put died (the r4 postscript class, device_build_10m_warm.md).

Prints one JSON row per line on stdout (same schema as bench_matrix
emit); the parent parses and merges them. Exit code 0 even when rows
record failures — rows ARE the report.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def hbm_headroom_gb(jax, jnp):
    """Largest power-of-two GB allocation that currently succeeds.

    The v5e is a shared tunneled chip: r4/r5 device-build failures track
    ambient tenants (a 12 GB probe alloc succeeded at a quiet hour,
    tools/logs/r5_queue3.log, while the same build RESOURCE_EXHAUSTEDs
    when contended — matrix_r5_tenm4/5.log). Probing before the build
    separates "our transients are too big" from "someone else has the
    chip"."""
    got = 0
    for gb in (2, 4, 8):
        try:
            x = jnp.zeros((gb << 28,), jnp.float32)  # gb * 2^30 bytes
            jax.block_until_ready(x)
            del x
            got = gb
        except Exception:
            break
    return got


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu.build.device_collapse import collapse_lbvh_device
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    res = int(os.environ.get("NANORT_MATRIX_TENM_RES", 8192))
    sub_t = 16
    v, f = make_subdivided_sphere_scene(10_000_000)
    cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                  width=res, height=res, fov=60.0)

    def emit(name, value, unit, **extra):
        row = {"metric": name, "value": round(value, 3), "unit": unit,
               **extra}
        print(json.dumps(row), flush=True)

    def time_traverse(s8t):
        # rays scoped here: the ~2 GB megabatch frees before any
        # rebuild (bench_matrix.py tenm section, r4 lesson)
        rays_t, _ = tile_image_rays(pinhole_rays(cam), min(128, res), 32)
        spec_t = detect_specialization(rays_t, sub=sub_t)
        h = traverse_bvh8(s8t, rays_t, specialize=spec_t, sub=sub_t)
        float(h.t.min())
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            h = traverse_bvh8(s8t, rays_t, specialize=spec_t, sub=sub_t)
            float(h.t.min())
            ts.append(time.perf_counter() - t0)
        return res * res / min(ts) / 1e6

    # wait for a quiet chip: the 10M build's phase-A transients need
    # ~4 GB of headroom on top of the inputs; don't burn an attempt
    # while another tenant holds the HBM
    headroom = hbm_headroom_gb(jax, jnp)
    waited = 0
    while headroom < 8 and waited < 900:
        print(f"# hbm headroom {headroom} GB, waiting for a quiet chip",
              file=sys.stderr, flush=True)
        time.sleep(150)
        waited += 150
        headroom = hbm_headroom_gb(jax, jnp)

    vd = jax.device_put(jnp.asarray(v))
    fd = jax.device_put(jnp.asarray(f))
    jax.block_until_ready(vd)
    # one retry: runs during TPU fault recovery fail with transient
    # UNAVAILABLE/INTERNAL errors (memory/axon-tpu-quirks class)
    last_err = None
    for attempt in range(2):
        try:
            t0 = time.perf_counter()
            sd = collapse_lbvh_device(vd, fd, width=16, max_leaf=9)
            float(np.asarray(sd.nodes[0, 0]))
            dev_build_s = time.perf_counter() - t0
            emit("coherent_primary_mrays_per_s_10mtri_devicebuild",
                 time_traverse(sd), "Mrays/s",
                 device_build_incl_compile_s=round(dev_build_s, 2),
                 res=res, sub=sub_t)
            last_err = None
            break
        except Exception as e:
            last_err = f"{type(e).__name__}: {e}"[:200]
            print(f"# devicebuild attempt {attempt} failed: "
                  f"{type(e).__name__}", file=sys.stderr, flush=True)
            time.sleep(150)  # TPU worker fault recovery window
    if last_err is not None:
        emit("coherent_primary_mrays_per_s_10mtri_devicebuild",
             -1.0, "Mrays/s", error=last_err, res=res, sub=sub_t,
             hbm_headroom_gb=headroom)
        return
    # warm rebuild (phase compiles cached), VERDICT r3 #4: free the
    # first build's tables, rebuild the same scene, time it
    # (tools/experiments/device_build_10m_warm.md protocol)
    try:
        del sd
        t0 = time.perf_counter()
        sd = collapse_lbvh_device(vd, fd, width=16, max_leaf=9)
        float(np.asarray(sd.nodes[0, 0]))
        emit("tenm_device_build_warm_s",
             time.perf_counter() - t0, "s", res=res)
    except Exception as e:
        emit("tenm_device_build_warm_s", -1.0, "s",
             error=f"{type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()

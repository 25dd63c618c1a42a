"""Standalone 10M fully-on-device build rows (subprocess of
bench_matrix.py's tenm section).

Two layers of process isolation, both learned the hard way:
- This file runs as a SUBPROCESS of bench_matrix so a RESOURCE_EXHAUSTED
  here cannot poison the parent's allocator (matrix_r5_tenm3/4: after a
  failed in-process device attempt even the host row's ~1.3 GB
  device_put died).
- Each build ATTEMPT runs as a subprocess of this file (``--attempt``):
  matrix_r5_tenm6 showed a failed attempt poisons its own process the
  same way, so an in-process retry always dies with RESOURCE_EXHAUSTED
  regardless of cause — fresh-process attempts make the retry real.

The v5e is a shared tunneled chip: r4's only green 10M build ran at a
quiet hour (exp_r4_devbuild5), while every contended-hour r5 attempt
RESOURCE_EXHAUSTEDs and a 3 GB device_put took 65 s at midday
(tools/logs/exp_r5_hbmprobe.json). The probe gate below separates "our
transients are too big" from "someone else has the chip";
``memory_stats()`` returns None on axon so allocation probing is the
only instrument.

Prints one JSON row per line on stdout (same schema as bench_matrix
emit); the parent parses and merges them. Exit code 0 even when rows
record failures — rows ARE the report.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MIN_HEADROOM_GB = int(os.environ.get("NANORT_TENM_MIN_HEADROOM_GB", 10))
MAX_WAIT_S = int(os.environ.get("NANORT_TENM_MAX_WAIT_S", 900))
ATTEMPTS = int(os.environ.get("NANORT_TENM_ATTEMPTS", 3))


def emit(name, value, unit, **extra):
    row = {"metric": name, "value": round(value, 3), "unit": unit,
           **extra}
    print(json.dumps(row), flush=True)


def hbm_headroom_gb(jax, jnp):
    """Largest probe allocation (GiB, from (2,4,8,12)) that currently
    succeeds. 12 green means the 10M build's whole transient envelope
    fits; 8 has been measured insufficient under ambient tenancy
    (matrix_r5_tenm6: probe passed at 8, build still exhausted)."""
    got = 0
    for gb in (2, 4, 8, 12):
        try:
            x = jnp.zeros((gb << 28,), jnp.float32)  # gb * 2^30 bytes
            jax.block_until_ready(x)
            del x
            got = gb
        except Exception:
            break
    return got


def run_attempt():
    """One fresh-allocator build attempt: device build, traverse row,
    warm rebuild row. Any failure prints an ERR line and exits 3."""
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

    phase = "device_put"
    try:
        vd = jax.device_put(jnp.asarray(v))
        fd = jax.device_put(jnp.asarray(f))
        jax.block_until_ready(vd)
        phase = "build"
        t0 = time.perf_counter()
        sd = collapse_lbvh_device(vd, fd, width=16, max_leaf=9)
        float(np.asarray(sd.nodes[0, 0]))
        dev_build_s = time.perf_counter() - t0
        print(f"# build green in {dev_build_s:.1f}s", file=sys.stderr,
              flush=True)
        phase = "traverse"
        mrays = time_traverse(sd)
        emit("coherent_primary_mrays_per_s_10mtri_devicebuild",
             mrays, "Mrays/s",
             device_build_incl_compile_s=round(dev_build_s, 2),
             res=res, sub=sub_t)
    except Exception as e:
        import traceback
        with open(os.path.join(os.path.dirname(__file__), "logs",
                               "tenm_attempt_trace.log"), "a") as fh:
            fh.write(f"==== phase={phase} {time.ctime()}\n")
            fh.write(traceback.format_exc())
        print(f"ERR [{phase}] {type(e).__name__}: {e}"[:300],
              file=sys.stderr, flush=True)
        return 3
    # warm rebuild (phase compiles cached), VERDICT r3 #4: free the
    # first build's tables, rebuild the same scene, time it
    # (tools/experiments/device_build_10m_warm.md protocol); rebuilding
    # while the first tables are still alive OOMs on fragmentation
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
    return 0


def main():
    import jax
    import jax.numpy as jnp

    res = int(os.environ.get("NANORT_MATRIX_TENM_RES", 8192))
    # wait for a quiet chip before burning a ~4-7 min attempt
    headroom = hbm_headroom_gb(jax, jnp)
    waited = 0
    while headroom < MIN_HEADROOM_GB and waited < MAX_WAIT_S:
        print(f"# hbm headroom {headroom} GB, waiting for a quiet chip",
              file=sys.stderr, flush=True)
        time.sleep(150)
        waited += 150
        headroom = hbm_headroom_gb(jax, jnp)

    errs = []
    for attempt in range(ATTEMPTS):
        sp = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--attempt"],
            capture_output=True, text=True)
        err = None
        for line in sp.stderr.splitlines():
            if line.startswith("ERR "):
                err = line[4:]
        got_rows = False
        for line in sp.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                print(line, flush=True)
                got_rows = True
        if got_rows and sp.returncode == 0:
            return
        errs.append(err or f"rc={sp.returncode}")
        print(f"# devicebuild attempt {attempt} failed: {errs[-1]}",
              file=sys.stderr, flush=True)
        if attempt + 1 < ATTEMPTS:
            time.sleep(150)  # TPU worker fault recovery window
    emit("coherent_primary_mrays_per_s_10mtri_devicebuild",
         -1.0, "Mrays/s", error="; ".join(e[:120] for e in errs),
         res=res, sub=16, hbm_headroom_gb=headroom)


if __name__ == "__main__":
    if "--attempt" in sys.argv:
        sys.exit(run_attempt())
    main()

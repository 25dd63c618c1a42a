"""r4 wave 3: make the 10M fully-on-device build REAL (VERDICT r3 #4):
record a WARM build time and prove two consecutive builds in one
process survive (the r3 run died with RESOURCE_EXHAUSTED on rebuild —
allocator fragmentation against the ~1 GB contiguous flat min-table,
now split per-level in build/device_collapse.py).

Protocol: build A (cold, incl. compiles) -> traverse sanity -> FREE the
scene -> build B of the same-bucket scene (warm: compile-cached) ->
build C keeping B's tables alive (the interactive-rebuild shape).

Run: nohup python tools/exp_r4_devbuild.py > \
    tools/logs/exp_r4_devbuild.out 2>&1 &
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

    from nanort_tpu.build.device_collapse import collapse_lbvh_device
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    n = int(os.environ.get("R4_TRIS", 10_000_000))
    v, f = make_subdivided_sphere_scene(n)
    emit("tris", int(len(f)))
    vd = jax.device_put(jnp.asarray(v, jnp.float32))
    fd = jax.device_put(jnp.asarray(f, jnp.int32))
    jax.block_until_ready((vd, fd))

    def build():
        t0 = time.perf_counter()
        s = collapse_lbvh_device(vd, fd, width=16, max_leaf=9)
        float(np.asarray(s.nodes[0, 0]))  # force completion
        return s, time.perf_counter() - t0

    import gc

    sA, tA = build()
    emit("build_cold_s", round(tA, 1))
    emit("nodes", int(sA.num_nodes))
    emit("leaf_rows", int(sA.num_leaf_rows))

    # free A COMPLETELY, rebuild (warm: same bucket -> cached compiles).
    # gc + a device barrier so A's tables are actually RELEASED before
    # B's transients allocate (the 10M peak leaves no headroom for both)
    del sA
    gc.collect()
    jax.block_until_ready(jnp.zeros(()) + 0)
    try:
        sB, tB = build()
        emit("build_warm_s", round(tB, 1))
    except Exception as e:  # noqa: BLE001
        emit("build_warm_err", f"{type(e).__name__}: {e}"[:200])
        return

    # rebuild while B's tables stay ALIVE (interactive rebuild shape)
    try:
        sC, tC = build()
        emit("build_warm_tables_alive_s", round(tC, 1))
        del sC
        gc.collect()
    except Exception as e:  # noqa: BLE001
        emit("build_tables_alive_err", f"{type(e).__name__}: {e}"[:200])

    # traverse sanity LAST (the ray megabatch would otherwise occupy
    # ~0.5 GB across the rebuilds)
    res = 4096
    cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                  width=res, height=res, fov=60.0)
    rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 32)
    spec = detect_specialization(rays_t, sub=16)
    h = traverse_bvh8(sB, rays_t, specialize=spec, sub=16)
    emit("hit_frac_B", round(float((np.asarray(h.prim_id)
                                    != 0xFFFFFFFF).mean()), 3))


if __name__ == "__main__":
    main()

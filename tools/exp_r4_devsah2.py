"""r4 wave 8: why does the SAH-top device tree trace WORSE than plain
LBVH (93.7-95.1 vs 126.4 Mrays/s; host SAH 142 — exp_r4_devsah.out)
despite ~5% better static SAH cost?

Isolation sweep: SAH depth (2/4/8 levels — if even a root-only SAH split
hurts, the reordering itself is the problem for packet unions) and bin
count (64 vs 16 — coarse top-level cuts?). Also LBVH at max_leaf=8 with
the host collapse's exact leaf size for a like-for-like host gap.

Run: nohup python tools/exp_r4_devsah2.py > \
    tools/logs/exp_r4_devsah2.out 2>&1 &
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

    v, f = make_subdivided_sphere_scene(1_000_000)
    emit("tris", int(len(f)))
    vd = jax.device_put(jnp.asarray(v, jnp.float32))
    fd = jax.device_put(jnp.asarray(f, jnp.int32))
    jax.block_until_ready((vd, fd))

    res = 8192
    cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                  width=res, height=res, fov=60.0)
    rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
    spec = detect_specialization(rays_t, sub=32)

    def bench(tag, **kw):
        try:
            s = collapse_lbvh_device(vd, fd, width=16, max_leaf=9, **kw)
            float(np.asarray(s.nodes[0, 0]))
            t0 = time.perf_counter()
            h = traverse_bvh8(s, rays_t, specialize=spec, sub=32)
            float(h.t.min())
            first = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                h = traverse_bvh8(s, rays_t, specialize=spec, sub=32)
                float(h.t.min())
                ts.append(time.perf_counter() - t0)
            emit(tag, round(res * res / min(ts) / 1e6, 1))
            emit(tag + "_first_s", round(first, 1))
            # node-visit counters: the union diagnostic
            h = traverse_bvh8(s, rays_t, specialize=spec, sub=32,
                              debug_counts=True)
            pops = np.asarray(h.u).reshape(-1, 32 * 128)[:, 0]
            drains = np.asarray(h.v).reshape(-1, 32 * 128)[:, 0]
            emit(tag + "_pops", round(float(pops.mean()), 2))
            emit(tag + "_drains", round(float(drains.mean()), 2))
            del s
        except Exception as e:  # noqa: BLE001
            emit(tag + "_err", f"{type(e).__name__}: {e}"[:160])
            time.sleep(130)

    bench("lbvh")
    bench("sah2", sah_levels=2, sah_stop=64)
    bench("sah4", sah_levels=4, sah_stop=64)
    bench("sah8", sah_levels=8, sah_stop=64)
    bench("sah10_b64", sah_levels=10, sah_bins=64, sah_stop=64)


if __name__ == "__main__":
    main()

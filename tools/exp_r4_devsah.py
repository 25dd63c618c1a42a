"""r4 wave 6: trace-perf of the device SAH-top build (VERDICT r3 #5).

Done criterion: a device-built 1M-tri scene traces within 5% of the
host-SAH tree on the headline config. Static wide-tree SA cost is NOT
predictive here (the host binary-SAH tree collapsed to width 16 scores
WORSE child-SA sums than device LBVH yet traced ~10% faster in r3 —
packet-union behavior is what matters), so this measures the real
thing: headline-config Mrays/s for host-SAH vs device-LBVH vs
device-SAH-top at several levels, plus device build times.

Run: nohup python tools/exp_r4_devsah.py > \
    tools/logs/exp_r4_devsah.out 2>&1 &
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
    from nanort_tpu.build.device_collapse import collapse_lbvh_device
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
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

    def bench(tag, s8):
        try:
            t0 = time.perf_counter()
            h = traverse_bvh8(s8, rays_t, specialize=spec, sub=32)
            float(h.t.min())
            emit(tag + "_first_s", round(time.perf_counter() - t0, 1))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                h = traverse_bvh8(s8, rays_t, specialize=spec, sub=32)
                float(h.t.min())
                ts.append(time.perf_counter() - t0)
            emit(tag, round(res * res / min(ts) / 1e6, 1))
            emit(tag + "_hitfrac",
                 round(float(np.asarray(h.hit).mean()), 4))
        except Exception as e:  # noqa: BLE001
            emit(tag + "_err", f"{type(e).__name__}: {e}"[:160])
            time.sleep(130)

    # host-SAH reference tree
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
    s_host = collapse_bvh8(bvh, v, f, width=16)
    s_host = s_host._replace(nodes=jnp.asarray(s_host.nodes),
                             leafs=jnp.asarray(s_host.leafs))
    bench("host_sah", s_host)
    del s_host

    for tag, kw in (
        ("dev_lbvh", {}),
        ("dev_sah10", dict(sah_levels=10, sah_stop=64)),
        ("dev_sah13", dict(sah_levels=13, sah_stop=32)),
        ("dev_sah16", dict(sah_levels=16, sah_stop=24)),
    ):
        try:
            s = collapse_lbvh_device(vd, fd, width=16, max_leaf=9, **kw)
            float(np.asarray(s.nodes[0, 0]))
            t0 = time.perf_counter()
            s = collapse_lbvh_device(vd, fd, width=16, max_leaf=9, **kw)
            float(np.asarray(s.nodes[0, 0]))
            emit(tag + "_build_warm_s", round(time.perf_counter() - t0, 2))
        except Exception as e:  # noqa: BLE001
            emit(tag + "_build_err", f"{type(e).__name__}: {e}"[:160])
            time.sleep(130)
            continue
        bench(tag, s)
        del s


if __name__ == "__main__":
    main()

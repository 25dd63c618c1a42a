"""Round-3: device build at 10M tris AFTER the O(1) range-minmax bbox
rewrite (sparse min-tables replace the 14.1 s refit fixpoint + 5.0 s
leaf-range scan) and the sparse-table gallop topology descent.

Measures: warm full build at 10M, traversal Mrays/s from the
device-built BVH16 at 8192^2/sub16, and a 64^2 parity spot-check vs the
stack engine on the same LBVH tree.

Run: nohup python tools/exp_r3_devbuild5.py > tools/logs/exp_r3_devbuild5.out 2> tools/logs/exp_r3_devbuild5.log &
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


def emit(k, val):
    RES[k] = val
    log(f"{k}: {val}")
    print(json.dumps(RES), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu.build.device_collapse import collapse_lbvh_device
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization, tile_image_rays, traverse_bvh8,
    )

    # ---- small parity check first (100K vs stack engine) ----
    from nanort_tpu import build_triangle_bvh, make_rays, traverse_triangles
    from nanort_tpu.ops.triangle import TriangleMesh

    v0, f0 = make_subdivided_sphere_scene(100_000)
    mesh0 = TriangleMesh(vertices=v0, faces=f0)
    bvh0, _ = build_triangle_bvh(mesh0)
    cam0 = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                   width=64, height=64, fov=60.0)
    r0 = pinhole_rays(cam0)
    h_ref = traverse_triangles(bvh0, mesh0, r0)
    sd0 = collapse_lbvh_device(
        jax.device_put(jnp.asarray(v0)), jax.device_put(jnp.asarray(f0)),
        width=16, max_leaf=9)
    flat0 = make_rays(np.asarray(r0.org).reshape(-1, 3),
                      np.asarray(r0.dir).reshape(-1, 3))
    h_dev = traverse_bvh8(sd0, flat0, sub=16)
    rh = np.asarray(h_ref.hit).reshape(-1)
    ok = (rh == np.asarray(h_dev.hit)).all() and np.allclose(
        np.asarray(h_ref.t).reshape(-1)[rh],
        np.asarray(h_dev.t)[rh], atol=1e-6)
    emit("parity_100k", bool(ok))

    # ---- 10M ----
    n_tris = int(os.environ.get("EXP_TRIS", 10_000_000))
    v, f = make_subdivided_sphere_scene(n_tris)
    vd = jax.device_put(jnp.asarray(v))
    fd = jax.device_put(jnp.asarray(f))
    jax.block_until_ready(vd)
    n = int(fd.shape[0])
    log(f"{n} tris")

    def full():
        s = collapse_lbvh_device(vd, fd, width=16, max_leaf=9)
        float(np.asarray(s.nodes[0, 0]))
        return s

    t0 = time.perf_counter()
    sd = full()
    emit("build_cold_s", round(time.perf_counter() - t0, 2))
    for i in range(2):
        sd = None  # free the previous tables BEFORE rebuilding: holding
        # them through a second 10M build tips HBM over
        t0 = time.perf_counter()
        sd = full()
        emit(f"build_warm{i}_s", round(time.perf_counter() - t0, 2))

    res = 8192
    cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                  width=res, height=res, fov=60.0)
    rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 32)
    sub = 16
    spec = detect_specialization(rays_t, sub=sub)

    def run():
        h = traverse_bvh8(sd, rays_t, specialize=spec, sub=sub)
        return float(h.t.min())

    run()
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    emit("traverse_10m_mrays", round(res * res / min(ts) / 1e6, 1))


if __name__ == "__main__":
    main()

"""Round-3 kernel experiments: bit-exact specializations + split tables.

Measures, in ONE process (same-session A/B is the only trustworthy
comparison on the axon tunnel):

  wt_base        watertight, current default            (r2: ~134 Mrays/s)
  wt_kz          + static shear axis (kz_static=2)
  wt_kzorg       + shared-origin scalarization
  woop_base      turbo                                  (r2: ~154-160)
  woop_org       turbo + shared origin
  wt_kzorg_s3    wt_kzorg + split node/leaf tables + pop_n=3
  woop_org_s3    woop_org + split tables + pop_n=3
  wt_kzorg_s3l4  fault-probe: + lq_cap=4

Every specialized variant is checked BIT-EXACT against its engine's
baseline on the full 67M-ray batch (device-side compare, scalar
readback). Split-table pop_n=3 probes the v5e backend fault that
currently clamps pop_n to 2 (pallas_packet.py clamp comment).

Run:  NANORT_EXPERIMENTAL_UNCLAMP=1 python tools/exp_r3_kernel.py
"""
import os
import sys
import time

os.environ["NANORT_EXPERIMENTAL_UNCLAMP"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    n_tris = int(os.environ.get("EXP_TRIS", 1_000_000))
    res = int(os.environ.get("EXP_RES", 8192))
    reps = int(os.environ.get("EXP_REPS", 3))
    sub = 32

    v, f = make_subdivided_sphere_scene(n_tris)
    mesh = TriangleMesh(vertices=v, faces=f)
    t0 = time.perf_counter()
    bvh, stats = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9)
    )
    log(f"build {time.perf_counter()-t0:.1f}s, {len(f)} tris")
    s8 = collapse_bvh8(bvh, v, f, woop=True)
    s8 = s8._replace(
        nodes=jax.device_put(jnp.asarray(s8.nodes)),
        leafs=jax.device_put(jnp.asarray(s8.leafs)),
        leafs_woop=jax.device_put(jnp.asarray(s8.leafs_woop)),
    )
    log(f"bvh8 {s8.num_nodes} nodes {s8.num_leaf_rows} leaf rows depth {s8.depth}")

    cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                  width=res, height=res, fov=60.0)
    rays = pinhole_rays(cam)
    rays_t, _ = tile_image_rays(rays, 128, 64)
    n_rays = res * res
    spec = detect_specialization(rays_t)
    log(f"detected specialization: {spec}")
    assert spec is not None and spec[0] is not None and spec[1]

    variants = [
        ("wt_base", dict()),
        ("wt_kz", dict(specialize=(spec[0], False))),
        ("wt_kzorg", dict(specialize=spec)),
        ("woop_base", dict(intersector="woop")),
        ("woop_org", dict(intersector="woop", specialize=(None, spec[1]))),
        ("wt_kzorg_s3", dict(specialize=spec, node_split=True,
                             leaf_split=True, pop_n=3)),
        ("woop_org_s3", dict(intersector="woop",
                             specialize=(None, spec[1]),
                             node_split=True, leaf_split=True, pop_n=3)),
        ("wt_kzorg_s3l4", dict(specialize=spec, node_split=True,
                               leaf_split=True, pop_n=3, lq_cap=4)),
    ]

    base_hits = {}
    results = {}
    for name, kw in variants:
        log(f"=== {name} {kw}")
        try:
            t0 = time.perf_counter()
            h = traverse_bvh8(s8, rays_t, sub=sub, **kw)
            _ = float(h.t.min())
            log(f"  first call {time.perf_counter()-t0:.0f}s")
            eng = kw.get("intersector", "watertight")
            if eng not in base_hits:
                base_hits[eng] = h
            else:
                b = base_hits[eng]
                nprim = int((h.prim_id != b.prim_id).sum())
                bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
                nt = int((bc(h.t) != bc(b.t)).sum())
                nu = int((bc(h.u) != bc(b.u)).sum())
                log(f"  vs {eng} base: prim diffs {nprim}, t bit-diffs "
                    f"{nt}, u bit-diffs {nu} / {n_rays}")
                results.setdefault(name, {})["diffs"] = (nprim, nt, nu)
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                h = traverse_bvh8(s8, rays_t, sub=sub, **kw)
                _ = float(h.t.min())
                times.append(time.perf_counter() - t0)
            best = min(times)
            mrays = n_rays / best / 1e6
            results.setdefault(name, {})["mrays"] = round(mrays, 1)
            log(f"  {name}: best {best*1e3:.1f} ms = {mrays:.1f} Mrays/s "
                f"(times {[round(x*1e3) for x in times]})")
        except Exception as e:  # noqa: BLE001 - fault probes may kill the worker
            log(f"  {name} FAILED: {type(e).__name__}: {str(e)[:500]}")
            results.setdefault(name, {})["error"] = type(e).__name__
            log("  sleeping 150s for possible TPU recovery")
            time.sleep(150)

    # ambient-drift recheck of the baseline at the end
    try:
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            h = traverse_bvh8(s8, rays_t, sub=sub)
            _ = float(h.t.min())
            times.append(time.perf_counter() - t0)
        log(f"wt_base recheck: {n_rays/min(times)/1e6:.1f} Mrays/s")
    except Exception as e:  # noqa: BLE001
        log(f"recheck failed: {e}")

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()

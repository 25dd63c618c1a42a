"""Headline benchmark: coherent primary rays on a ~1M-triangle scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

vs_baseline is measured Mrays/s divided by the 200 Mrays/s/chip north-star
target (BASELINE.json) — the reference publishes no numbers of its own
(BASELINE.md).

Path: native C++ SAH build -> BVH8 collapse -> Pallas packet traversal
kernel (VMEM-resident scene; see nanort_tpu/traverse/pallas_packet.py).
Timing forces a scalar readback per rep: on the tunneled axon backend,
block_until_ready returns at enqueue, not completion.

Env knobs:
  NANORT_BENCH_TRIS   (default 1_000_000)
  NANORT_BENCH_RES    (default 8192 -> a 67M-ray megabatch; packet
                       traversal efficiency grows with ray density, and
                       megabatching is the intended production usage:
                       8192^2 -> 109 Mrays/s measured on v5e with
                       ordered near-first traversal)
  NANORT_BENCH_REPS   (default 3)
  NANORT_BENCH_LEAF   (default 9: 12-lane woop rows hold 9
                       tris; ~11% fewer leaf rows than 8,
                       measured +2.7% same-process)
  NANORT_BENCH_SUB    (default: 32 -> 4096-ray packets for watertight,
                       64 for turbo — woop's lower VREG pressure
                       prefers bigger packets)
  NANORT_BENCH_WIDTH  (default 16: dense single-row BVH16 nodes — 16
                       exact f32 child boxes per (1, 128) row, 32 slab
                       tests per vector->scalar sync with pop_n=2;
                       bit-exact vs width 8, measured +4.8% watertight
                       / +29% woop same-process. 8: two-row BVH8.)
  NANORT_BENCH_PATH   ("pallas" | "wavefront", default pallas)
  NANORT_BENCH_ENGINE ("watertight" | "turbo" | "turbo_refit", default
                       watertight: the end-to-end reference-parity
                       kernel — since round 3 it auto-applies the
                       bit-exact batch specializations (static shear
                       axis + shared origin, detect_specialization),
                       measured +17% with 0 record bit-diffs. "turbo"
                       is the Woop unit-triangle leaf kernel: ~8%
                       faster still, but NOT parity-grade — t within
                       4 ulp on only ~97.6% of hits and rays exactly on
                       shared edges can miss (~1/16K on an axis-aligned
                       scene). "turbo_refit" adds a watertight
                       re-intersection of each selected prim (bit-exact
                       per-prim records, costs a 67M-row gather).)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

NORTH_STAR_MRAYS = 200.0


def main():
    import jax
    import jax.numpy as jnp

    n_tris = int(os.environ.get("NANORT_BENCH_TRIS", 1_000_000))
    res = int(os.environ.get("NANORT_BENCH_RES", 8192))
    reps = int(os.environ.get("NANORT_BENCH_REPS", 3))
    leaf = int(os.environ.get("NANORT_BENCH_LEAF", 9))
    _sub_env = os.environ.get("NANORT_BENCH_SUB")
    path = os.environ.get("NANORT_BENCH_PATH", "pallas")

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh

    v, f = make_subdivided_sphere_scene(n_tris)
    mesh = TriangleMesh(vertices=v, faces=f)
    t0 = time.perf_counter()
    bvh, stats = build_triangle_bvh(
        mesh,
        BVHBuildOptions(min_leaf_primitives=leaf, max_leaf_primitives=leaf),
    )
    build_s = time.perf_counter() - t0
    print(
        f"# scene {len(f)} tris; build {build_s:.2f}s "
        f"({len(f)/build_s/1e6:.2f} Mtris/s), {bvh.num_nodes} nodes, "
        f"depth {stats.max_tree_depth}",
        file=sys.stderr,
    )

    cam = look_at(
        eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
        width=res, height=res, fov=60.0,
    )
    rays = pinhole_rays(cam)
    n_rays = res * res

    if path == "pallas":
        from nanort_tpu.build.bvh8 import collapse_bvh8
        from nanort_tpu.traverse.pallas_packet import (
            detect_specialization,
            refit_hits_watertight,
            tile_image_rays,
            traverse_bvh8,
        )

        # "watertight" (default): reference-parity records end to end
        # (BASELINE.json north star). "turbo" trades parity for ~8%
        # (docstring above). "turbo_refit" restores bit-exact per-prim
        # records via an XLA re-intersection pass.
        engine = os.environ.get("NANORT_BENCH_ENGINE", "watertight")
        # width 16 (default): dense single-row BVH16 nodes — one node
        # pop fetches ONE (1, 128) row carrying 16 exact f32 child
        # boxes, doubling slab tests per vector->scalar sync. Records
        # are BIT-EXACT vs the 8-wide tables (0 prim/t diffs over 67M
        # rays); measured +4.8% watertight / +29% woop same-process.
        width = int(os.environ.get("NANORT_BENCH_WIDTH", 16))
        # packet size: watertight peaks at sub=32 (4096-ray packets),
        # the woop leaf kernel's lower VREG pressure prefers sub=64
        sub = int(_sub_env) if _sub_env else (
            64 if engine.startswith("turbo") else 32)
        s8 = collapse_bvh8(bvh, v, f, width=width,
                           woop=engine.startswith("turbo"))
        s8 = s8._replace(
            nodes=jax.device_put(jnp.asarray(s8.nodes)),
            leafs=jax.device_put(jnp.asarray(s8.leafs)),
            leafs_woop=(
                jax.device_put(jnp.asarray(s8.leafs_woop))
                if s8.leafs_woop is not None else None
            ),
        )
        # measured-best pixel tiles: watertight 128x64 @ sub32; woop
        # 256x64 @ sub64 (164.5 vs 153.9 Mrays/s same-session)
        tile_h = int(os.environ.get(
            "NANORT_BENCH_TILE_H",
            256 if engine.startswith("turbo") else 128))
        tile_w = min((8 * sub * 32) // tile_h, res)
        rays_t, _ = tile_image_rays(rays, min(tile_h, res), tile_w)
        # bit-exact batch specializations (one-time device check): camera
        # primaries share a shear axis and one origin -> static-lane leaf
        # tests + scalar origin terms, measured +17% wt / +8% woop with
        # ZERO record bit-diffs on this exact workload
        spec = detect_specialization(rays_t, sub=sub)
        print(f"# specialization: {spec}", file=sys.stderr)

        if engine == "turbo":
            def run():
                h = traverse_bvh8(s8, rays_t, sub=sub,
                                  intersector="woop", specialize=spec)
                # scalar readback forces completion through the tunnel
                return float(h.t.min()), h
        elif engine == "turbo_refit_inkernel":
            # measured NEGATIVE (r4, exp_r4_refit2.out): the in-kernel
            # drained-row replay restores bit-exact watertight t/u/v for
            # the woop winner but costs 87-103 Mrays/s vs 142.7
            # watertight — kept selectable for auditability
            def run():
                h = traverse_bvh8(s8, rays_t, sub=sub, intersector="woop",
                                  specialize=spec, refit_inkernel=True)
                return float(h.t.min()), h
        elif engine == "turbo_refit":
            refit = jax.jit(
                lambda r, h: refit_hits_watertight(mesh, r, h)
            )

            def run():
                h = traverse_bvh8(s8, rays_t, sub=sub,
                                  intersector="woop", specialize=spec)
                h = refit(rays_t, h)
                return float(h.t.min()), h
        else:
            def run():
                h = traverse_bvh8(s8, rays_t, sub=sub, specialize=spec)
                return float(h.t.min()), h
    else:
        from nanort_tpu.traverse.packed import pack_scene
        from nanort_tpu.traverse.wavefront import traverse_wavefront

        scene = pack_scene(bvh, v, f)
        scene = scene.__class__(
            jax.device_put(jnp.asarray(scene.nodes)),
            jax.device_put(jnp.asarray(scene.soup)),
            scene.num_nodes,
            scene.num_prims,
        )

        def run():
            h = traverse_wavefront(scene, rays, max_leaf=leaf, tile=4096)
            return float(h.t.min()), h

    t0 = time.perf_counter()
    _, hits = run()
    print(f"# first call (incl compile): {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    hit_frac = float(np.asarray(hits.hit).mean())
    print(f"# hit fraction {hit_frac:.3f}", file=sys.stderr)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    mrays = n_rays / best / 1e6
    print(
        f"# {n_rays} rays: best {best*1e3:.1f} ms over {reps} reps "
        f"(median {sorted(times)[len(times)//2]*1e3:.1f} ms)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "coherent_primary_mrays_per_s_1mtri",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

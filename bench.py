"""Headline benchmark: coherent primary rays on a ~1M-triangle scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

vs_baseline is measured Mrays/s divided by the 200 Mrays/s/chip north-star
target (BASELINE.json) — the reference publishes no numbers of its own
(BASELINE.md).

Run on the real TPU (default backend). Smaller/faster settings via env:
  NANORT_BENCH_TRIS   (default 1_000_000)
  NANORT_BENCH_RES    (default 1024 -> 1024x1024 rays/frame)
  NANORT_BENCH_REPS   (default 5)
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

    n_tris = int(os.environ.get("NANORT_BENCH_TRIS", 1_000_000))
    res = int(os.environ.get("NANORT_BENCH_RES", 1024))
    reps = int(os.environ.get("NANORT_BENCH_REPS", 5))

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.packed import pack_scene
    from nanort_tpu.traverse.wavefront import traverse_wavefront

    leaf = int(os.environ.get("NANORT_BENCH_LEAF", 16))
    tile = int(os.environ.get("NANORT_BENCH_TILE", 4096))

    v, f = make_subdivided_sphere_scene(n_tris)
    mesh = TriangleMesh(vertices=v, faces=f)
    t0 = time.perf_counter()
    bvh, stats = build_triangle_bvh(
        mesh,
        BVHBuildOptions(min_leaf_primitives=leaf, max_leaf_primitives=leaf),
    )
    build_s = time.perf_counter() - t0
    scene = pack_scene(bvh, v, f)
    print(
        f"# scene {len(f)} tris; build {build_s:.1f}s "
        f"({len(f)/build_s/1e6:.3f} Mtris/s), {bvh.num_nodes} nodes, "
        f"depth {stats.max_tree_depth}",
        file=sys.stderr,
    )

    # camera close enough that ~all rays hit (coherent primary visibility)
    cam = look_at(
        eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
        width=res, height=res, fov=60.0,
    )
    rays = pinhole_rays(cam)
    n_rays = res * res

    run = lambda: jax.block_until_ready(
        traverse_wavefront(scene, rays, max_leaf=leaf, tile=tile)
    )
    hits = run()  # compile + warmup
    hit_frac = float(np.asarray(hits.hit).mean())
    print(f"# warmup done; hit fraction {hit_frac:.3f}", file=sys.stderr)

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

"""Round-3: profile the 10M-tri BVH8 collapse stage breakdown (host
NumPy, CPU-only — VERDICT item 2 wants build+collapse < 15 s; r3 logs
show ~30 s SAH + ~143 s collapse at min/max_leaf=9).

Run: nohup python tools/exp_r3_collapseprof.py > tools/logs/exp_r3_collapseprof.out 2> tools/logs/exp_r3_collapseprof.log &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["NANORT_COLLAPSE_PROFILE"] = "1"


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.ops.triangle import TriangleMesh

    n = int(os.environ.get("EXP_TRIS", 10_000_000))
    t0 = time.perf_counter()
    v, f = make_subdivided_sphere_scene(n)
    log(f"scene {time.perf_counter()-t0:.1f}s ({len(f)} tris)")
    mesh = TriangleMesh(vertices=v, faces=f)
    t0 = time.perf_counter()
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9)
    )
    log(f"sah build {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    s8 = collapse_bvh8(bvh, v, f)
    log(f"collapse(wt) total {time.perf_counter()-t0:.1f}s: "
        f"{s8.num_nodes} nodes {s8.num_leaf_rows} rows")


if __name__ == "__main__":
    main()

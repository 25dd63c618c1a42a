"""Round-3: path-tracer megabatch stage costs (config B target <= 10 s
at 512^2 x 100 spp; measured 39s r2 per-spp, first megabatch numbers
polluted by compiles).

Times trace_paths at spp_batch=25 (6.55M-ray bounce rounds) for
max_bounces in {1, 2, 5, 10} -> marginal cost per bounce, plus the
closest-hit and shadow traces alone on representative bounce rays.

Run: nohup python tools/exp_r3_pt.py > tools/logs/exp_r3_pt.out 2> tools/logs/exp_r3_pt.log &
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


def timeit(tag, fn, n=2):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    log(f"{tag}: {min(ts)*1e3:.0f} ms {[round(x*1e3) for x in ts]}")
    RES[tag] = round(min(ts) * 1e3)
    print(json.dumps(RES), flush=True)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import make_rays
    from nanort_tpu.io.procedural import make_cornell_pt_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.path_tracer import make_pt_scene, trace_paths
    from nanort_tpu.traverse.ray_sort import traverse_bvh8_sorted

    sv, sf, mids, mats = make_cornell_pt_scene(2.0)
    pts = make_pt_scene(sv, sf, mids, mats, engine="pallas")
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=512, height=512, fov=45.0)
    rays = pinhole_rays(cam)
    key = jax.random.PRNGKey(3)
    org = rays.org.reshape(-1, 3)
    d = rays.dir.reshape(-1, 3)
    R = org.shape[0]
    n = 25
    org_all = jnp.broadcast_to(org[None], (n, R, 3)).reshape(-1, 3)
    dir_all = jnp.broadcast_to(d[None], (n, R, 3)).reshape(-1, 3)
    jax.block_until_ready(org_all)
    RB = n * R
    log(f"megabatch {RB} rays, scene {len(sf)} tris")

    prev = 0.0
    for mb in (1, 2, 5, 10):
        def run():
            c = trace_paths(pts, org_all, dir_all, key, max_bounces=mb)
            return float(c.min())

        t = timeit(f"trace_paths_b{mb}_ms", run)
        if prev:
            log(f"  marginal per bounce: {(t-prev)/(mb-prev_mb)*1e3:.0f} ms")
        prev, prev_mb = t, mb

    # lone closest-hit trace on random-direction rays from inside
    rng = np.random.default_rng(5)
    dd = rng.normal(size=(RB, 3))
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    borg = jnp.asarray(
        rng.uniform(-1.5, 1.5, (RB, 3)).astype(np.float32))
    bdir = jnp.asarray(dd.astype(np.float32))
    brays = make_rays(borg, bdir)
    jax.block_until_ready(brays.org)

    def run_closest():
        h = traverse_bvh8_sorted(pts.scene8, brays)
        return float(h.t.min())

    t = timeit("bounce_closest_ms", run_closest)
    RES["bounce_closest_mrays"] = round(RB / t / 1e6, 1)

    def run_shadow():
        h = traverse_bvh8_sorted(pts.scene8, brays, occlusion=True)
        return float(h.t.min())

    t = timeit("bounce_shadow_ms", run_shadow)
    RES["bounce_shadow_mrays"] = round(RB / t / 1e6, 1)
    print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    main()

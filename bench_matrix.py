"""Tracked benchmark matrix (BASELINE.md configs A/B + capacity rows).

Writes BENCH_MATRIX.json (list of rows) and prints one JSON line per row.
The driver-facing single-line benchmark stays bench.py; this is the wider
matrix the round reports track (VERDICT r1 #8).

Rows (each skippable via NANORT_MATRIX_SKIP=name1,name2):
  headline    coherent primary rays, 1M tris, 8192^2 (bench.py config) —
              one row per engine: turbo (Woop leaf kernel, the bench.py
              default) and watertight (end-to-end reference parity)
  config_a    objrender-style 512^2 AOV pass + 8-sample AO (cornell+sphere;
              reference examples/objrender/main.cc:582-587)
  config_b    path tracer 512^2, SPP (default 100), <=10 bounces, NEE+RR
              (reference examples/path_tracer/main.cc:31-33)
  incoherent  fully-random rays on the 1M-tri scene (wavefront engine)
  tenm        coherent primaries on a 10M-tri scene (HBM scene space)

Run on real TPU: nohup python bench_matrix.py > /tmp/matrix.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

SKIP = set(
    s for s in os.environ.get("NANORT_MATRIX_SKIP", "").split(",") if s
)
# NANORT_MATRIX_MERGE=1: re-run a subset of rows (via SKIP) and merge
# them into the existing BENCH_MATRIX.json instead of replacing the
# whole file — rows with the same metric name are updated in place.
MERGE = os.environ.get("NANORT_MATRIX_MERGE") == "1"
ROWS = []


def _write():
    out = ROWS
    if MERGE and os.path.exists("BENCH_MATRIX.json"):
        with open("BENCH_MATRIX.json") as fh:
            out = json.load(fh)
        new = {r["metric"]: r for r in ROWS}
        out = [new.pop(r["metric"], r) for r in out] + list(new.values())
    with open("BENCH_MATRIX.json", "w") as fh:
        json.dump(out, fh, indent=1)


def emit(name, value, unit, **extra):
    row = {"metric": name, "value": round(value, 3), "unit": unit, **extra}
    ROWS.append(row)
    print(json.dumps(row), flush=True)
    # write after every row: a crash in a later section (e.g. an HBM
    # OOM at 10M tris) must not lose the earlier measurements
    _write()


def readback(x):
    return float(np.asarray(x).reshape(-1)[0])


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh, make_rays
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import (
        make_cornell_box,
        make_cornell_pt_scene,
        make_subdivided_sphere_scene,
        make_uv_sphere,
        merge_meshes,
    )
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    opt8 = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)

    # ---- headline: 1M tris, 8192^2 coherent primaries ----
    # headline_unspec is its own skippable row: watertight WITHOUT the
    # batch specializations (static shear axis + shared origin +
    # uniform sign) — the general-coherent-batch number, so the gap the
    # single-camera specializations buy stays visible in the tracked
    # matrix (VERDICT r4 weak #5)
    if ("headline" not in SKIP or "headline_unspec" not in SKIP
            or "headline_devtree" not in SKIP):
        res = 8192
        v, f = make_subdivided_sphere_scene(1_000_000)
        mesh = TriangleMesh(vertices=v, faces=f)
        opt9 = BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9)
        t0 = time.perf_counter()
        bvh, _ = build_triangle_bvh(mesh, opt9)
        build_s = time.perf_counter() - t0
        if "headline" not in SKIP:
            emit("sah_build_1mtri", len(f) / build_s / 1e6, "Mtris/s")
        # bench.py's measured-best recipe: dense BVH16 tables (bit-exact
        # vs BVH8), watertight sub=32 @ 128x64 tiles, woop sub=64 @
        # 256x64 tiles
        s16 = collapse_bvh8(bvh, v, f, width=16, woop=True)
        s16 = s16._replace(
            nodes=jax.device_put(jnp.asarray(s16.nodes)),
            leafs=jax.device_put(jnp.asarray(s16.leafs)),
            leafs_woop=jax.device_put(jnp.asarray(s16.leafs_woop)),
        )
        cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                      width=res, height=res, fov=60.0)
        rays = pinhole_rays(cam)
        variants = []
        if "headline" not in SKIP:
            variants += [("turbo", 64, (256, 64), True, True),
                         ("watertight", 32, (128, 64), False, True)]
        if "headline_unspec" not in SKIP:
            variants += [("watertight_unspec", 32, (128, 64), False,
                          False)]
        for engine, sub, tile, woop, specialized in variants:
            rays_t, _ = tile_image_rays(rays, *tile)
            spec = (detect_specialization(rays_t, sub=sub)
                    if specialized else None)
            # full spec tuple for BOTH engines, exactly like bench.py
            # (traverse_bvh8 drops kz_static itself for woop); the old
            # (None, shared) form under-specialized the turbo row
            # (ADVICE r3 #4)
            kw = dict(intersector="woop", sub=sub, specialize=spec) \
                if woop else dict(sub=sub, specialize=spec)
            h = traverse_bvh8(s16, rays_t, **kw)
            float(h.t.min())
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                h = traverse_bvh8(s16, rays_t, **kw)
                float(h.t.min())
                ts.append(time.perf_counter() - t0)
            mr = res * res / min(ts) / 1e6
            emit(f"coherent_primary_mrays_per_s_1mtri_{engine}", mr,
                 "Mrays/s", vs_north_star=round(mr / 200, 3))

        # device-built tree on the same scene/rays/engine: tracks the
        # device-tree traversal tax (VERDICT r4 #4 bar: within 5% of
        # the host-SAH watertight row above; measured 1.7% same-session
        # with the leaf-merge + preorder defaults, exp_r5_devgap)
        if "headline_devtree" not in SKIP:
            from nanort_tpu.build.device_collapse import (
                collapse_lbvh_device,
            )

            t0 = time.perf_counter()
            sdev = collapse_lbvh_device(jnp.asarray(v), jnp.asarray(f),
                                        width=16, max_leaf=9)
            float(np.asarray(sdev.nodes[0, 0]))
            dev_build_s = time.perf_counter() - t0
            rays_t, _ = tile_image_rays(rays, 128, 64)
            spec = detect_specialization(rays_t, sub=32)
            h = traverse_bvh8(sdev, rays_t, sub=32, specialize=spec)
            float(h.t.min())
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                h = traverse_bvh8(sdev, rays_t, sub=32, specialize=spec)
                float(h.t.min())
                ts.append(time.perf_counter() - t0)
            mr = res * res / min(ts) / 1e6
            emit("coherent_primary_mrays_per_s_1mtri_devicebuild", mr,
                 "Mrays/s", vs_north_star=round(mr / 200, 3),
                 device_build_incl_compile_s=round(dev_build_s, 2))
            del sdev
        del s16, bvh, mesh

    # ---- config A: objrender 512^2 AOVs + AO ----
    if "config_a" not in SKIP:
        from nanort_tpu.models.objrender import render_ao

        v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(64, 128, 0.6))
        mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
        bvh, _ = build_triangle_bvh(mesh, opt8)
        s8 = collapse_bvh8(bvh, v, f, width=16)
        s8 = s8._replace(nodes=jnp.asarray(s8.nodes),
                         leafs=jnp.asarray(s8.leafs))
        cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                      width=512, height=512, fov=45.0)
        rays = pinhole_rays(cam)
        key = jax.random.PRNGKey(7)
        n_samples = 8

        spec_a = detect_specialization(rays)

        def run_a():
            # r4 recipe: azimuth-stratified draws + 32x32-tiled
            # sample-major occlusion packets, traced direct (no sort):
            # end-to-end 201 -> 83 ms (tools/logs/exp_r4_aoship.out)
            aovs, hits = render_ao(bvh, mesh, rays, key,
                                   n_samples=n_samples, max_leaf=8,
                                   scene8=s8, specialize=spec_a, sub=8)
            return readback(aovs["ao"].min()), hits

        t0 = time.perf_counter()
        run_a()
        print(f"# config_a first {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_a()
            ts.append(time.perf_counter() - t0)
        total_rays = 512 * 512 * (1 + n_samples)
        emit("objrender_ao_512", min(ts), "s",
             effective_mrays=round(total_rays / min(ts) / 1e6, 2),
             tris=len(f), ao_samples=n_samples)

    # ---- config B: path tracer 512^2 x SPP on the PROTOCOL scene ----
    # BASELINE.md's own protocol: "run ... path_tracer on the bundled
    # cornellbox_suzanne.obj" (974 faces, reference
    # examples/path_tracer/main.cc:704-705). The scene rides the
    # BVH-traced fused Pallas megakernel via render_path_traced's
    # auto-routing (models/pt_fused.render_fused_bvh).
    if "config_b" not in SKIP:
        from nanort_tpu.models.path_tracer import (
            make_pt_scene,
            render_path_traced,
        )

        spp = int(os.environ.get("NANORT_MATRIX_SPP", 100))
        obj_path = os.environ.get(
            "NANORT_MATRIX_OBJ",
            "/root/reference/examples/common/cornellbox_suzanne.obj")
        if os.path.exists(obj_path):
            from nanort_tpu.io.obj import (
                CORNELL_GROUP_MATERIALS,
                load_obj,
                remap_materials_by_object,
            )

            m = load_obj(obj_path)
            m = remap_materials_by_object(m, CORNELL_GROUP_MATERIALS)
            sv, sf, mids, mats = (m.vertices, m.faces, m.material_ids,
                                  m.materials)
            scene_tag = os.path.basename(obj_path)
            bmin = np.asarray(sv).min(0)
            bmax = np.asarray(sv).max(0)
            ctr = (bmin + bmax) / 2
            eye = tuple(ctr + np.asarray(
                [0, 0, 2.5 * (bmax - bmin).max()]))
            ctr = tuple(ctr)
        else:
            sv, sf, mids, mats = make_cornell_pt_scene(2.0)
            scene_tag = "procedural_cornell"
            eye, ctr = (0, 0.0, 5.0), (0, 0, 0)
        pts = make_pt_scene(sv, sf, mids, mats, engine="pallas")
        cam = look_at(eye=eye, center=ctr, width=512, height=512, fov=45.0)
        rays = pinhole_rays(cam)
        key = jax.random.PRNGKey(3)

        def run_b(n):
            img = render_path_traced(pts, rays, key, spp=n, max_bounces=10,
                                     tile=16384)
            return readback(img.mean())

        # warm at FULL spp: the fused kernel's grid/loop bake spp in, so
        # an spp=1 warmup does not prime the spp=100 compile (r4 matrix
        # initially timed 6.4 s = ~4.5 s compile + 1.9 s render)
        t0 = time.perf_counter()
        run_b(spp)
        first = time.perf_counter() - t0
        print(f"# config_b first ({spp} spp) {first:.0f}s",
              file=sys.stderr, flush=True)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            run_b(spp)
            ts.append(time.perf_counter() - t0)
        dur = min(ts)
        emit("path_tracer_512_spp", dur, "s", spp=spp,
             scene=scene_tag, faces=int(np.asarray(sf).shape[0]),
             samples_per_s=round(512 * 512 * spp / dur / 1e6, 2),
             first_incl_compile_s=round(first, 1))

    # ---- mid-scale PT: ~100K-tri scene through the same fused BVH
    # route (VERDICT r4 #6: measure between the 974-face protocol scene
    # and PT_FUSED_BVH_MAX_TRIS, where the XLA megabatch used to
    # cliff at ~43.5 s) ----
    if "pt_midscale" not in SKIP:
        from nanort_tpu.io.procedural import make_cornell_dense_pt_scene
        from nanort_tpu.models.path_tracer import (
            make_pt_scene,
            render_path_traced,
        )

        spp_m = int(os.environ.get("NANORT_MATRIX_SPP", 100))
        sv_m, sf_m, mids_m, mats_m = make_cornell_dense_pt_scene(100_000)
        pts_m = make_pt_scene(sv_m, sf_m, mids_m, mats_m, engine="pallas")
        cam_m = look_at(eye=(0, 0.0, 2.6), center=(0, 0, 0),
                        width=512, height=512, fov=45.0)
        rays_m = pinhole_rays(cam_m)
        key_m = jax.random.PRNGKey(3)

        def run_m(n):
            img = render_path_traced(pts_m, rays_m, key_m, spp=n,
                                     max_bounces=10)
            return readback(img.mean())

        t0 = time.perf_counter()
        run_m(spp_m)  # warm at FULL spp (see config_b note)
        first_m = time.perf_counter() - t0
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            run_m(spp_m)
            ts.append(time.perf_counter() - t0)
        dur_m = min(ts)
        emit("path_tracer_midscale_100k", dur_m, "s", spp=spp_m,
             faces=int(np.asarray(sf_m).shape[0]),
             samples_per_s=round(512 * 512 * spp_m / dur_m / 1e6, 2),
             first_incl_compile_s=round(first_m, 1))

    # ---- incoherent: fully-random rays, treelet-binned engine ----
    if "incoherent" not in SKIP:
        from nanort_tpu.traverse.treelet import (
            make_treelets,
            traverse_bvh8_binned,
        )

        v, f = make_subdivided_sphere_scene(1_000_000)
        mesh = TriangleMesh(vertices=v, faces=f)
        bvh, _ = build_triangle_bvh(mesh, opt8)
        s8i = collapse_bvh8(bvh, v, f)
        # T=1024 measured best in the r5 knob sweep (1.105 vs 1.034
        # Mrays/s at T=512, identical prim selection across every
        # variant — tools/logs/exp_r5_incoknobs.json)
        tl, s8i = make_treelets(s8i, 1024)
        s8i = s8i._replace(
            nodes=jax.device_put(jnp.asarray(s8i.nodes)),
            leafs=jax.device_put(jnp.asarray(s8i.leafs)),
        )
        R = 4_194_304
        rng = np.random.default_rng(11)
        lo, hi = np.asarray(bvh.bmin[0]), np.asarray(bvh.bmax[0])
        org = rng.uniform(lo, hi, (R, 3)).astype(np.float32)
        d = rng.normal(size=(R, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = make_rays(org, d.astype(np.float32))

        def run_i():
            # octant-major + sub=16: measured best fully-random recipe
            # (tools/logs/exp_r3_inco2.out: 1.19 -> 1.34 Mrays/s, 0
            # prim mismatches)
            h = traverse_bvh8_binned(s8i, rays, treelets=tl, K=8,
                                     octant_major=True, sub=16)
            return float(h.t.min())

        run_i()
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            run_i()
            ts.append(time.perf_counter() - t0)
        emit("incoherent_random_mrays_per_s_1mtri", R / min(ts) / 1e6,
             "Mrays/s", engine="treelet_binned", n_treelets=1024, K=8,
             octant_major=True, sub=16)

        # ---- realistic incoherent: AO bounce rays off primary hits,
        # Morton-sorted, any-hit packets (the workload class behind
        # BASELINE.md's "realistic AO/PT bounces sort far better") ----
        from nanort_tpu.traverse.ray_sort import traverse_bvh8_sorted
        from nanort_tpu.models.objrender import build_onb, face_normals
        from nanort_tpu.models.objrender import _cosine_hemisphere

        res_b = 1024
        cam_b = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                        width=res_b, height=res_b, fov=60.0)
        prim = pinhole_rays(cam_b)
        rays_p, _ = tile_image_rays(prim, 128, 32)
        hp = traverse_bvh8(s8i, rays_p, specialize=detect_specialization(
            rays_p))
        hitm = hp.prim_id != jnp.uint32(0xFFFFFFFF)
        S = 4
        key = jax.random.PRNGKey(3)
        n = face_normals(mesh, jnp.where(hitm, hp.prim_id, 0).astype(
            jnp.uint32))
        x = rays_p.org + rays_p.dir * hp.t[:, None]
        n = jnp.where((n * rays_p.dir).sum(-1, keepdims=True) > 0, -n, n)
        t_o, b_o = build_onb(n)
        local = _cosine_hemisphere(key, (S, n.shape[0]), jnp.float32)
        wdir = (local[..., 0:1] * t_o + local[..., 1:2] * b_o
                + local[..., 2:3] * n)
        borg = jnp.broadcast_to(x + n * 1e-3, (S,) + x.shape).reshape(-1, 3)
        bdir = wdir.reshape(-1, 3)
        bmax = jnp.where(jnp.broadcast_to(hitm, (S, hitm.shape[0])
                                          ).reshape(-1), 0.5, -1.0)
        brays = make_rays(borg, bdir, max_t=bmax)
        RB = int(brays.org.shape[0])

        def run_ao():
            h = traverse_bvh8_sorted(s8i, brays, occlusion=True)
            return float(h.t.min())

        run_ao()
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            run_ao()
            ts.append(time.perf_counter() - t0)
        emit("incoherent_bounce_mrays_per_s_1mtri", RB / min(ts) / 1e6,
             "Mrays/s", engine="sorted_packets_anyhit", samples=S,
             res=res_b)

    # ---- 10M tris via HBM scene space ----
    if "tenm" not in SKIP:
        # megabatch at full density: packet traversal cost scales with
        # geometry per packet footprint, so the honest Mrays/s for the
        # "~10M triangles efficiently" claim uses the same ray density
        # as the 1M headline (res 8192); sub=16 packets halve the union
        # footprint (r3: 8192^2/sub16 33.5 vs 4096^2/sub32 8.3 Mrays/s)
        res = int(os.environ.get("NANORT_MATRIX_TENM_RES", 8192))
        v, f = make_subdivided_sphere_scene(10_000_000)
        mesh = TriangleMesh(vertices=v, faces=f)
        cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                      width=res, height=res, fov=60.0)
        sub_t = 16

        def time_traverse(s8t):
            # rays are scoped here so the ~2 GB megabatch is freed
            # before the device build below (keeping it resident put
            # the r4 matrix devicebuild over the HBM edge:
            # RESOURCE_EXHAUSTED on both attempts while the standalone
            # exp_r4_devbuild5 protocol succeeded)
            rays_t, _ = tile_image_rays(pinhole_rays(cam),
                                        min(128, res), 32)
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

        # (b) interactive build FIRST: fully device-side LBVH -> BVH16
        # (LBVH tree quality traces ~15-20% slower, but the whole build
        # runs on-chip in seconds — the "~10M tris efficiently" capacity
        # story no longer depends on a minutes-long host pass). The
        # device rows run in a SUBPROCESS (tools/matrix_tenm_device.py):
        # phase A needs GBs of transient tables and only succeeds on a
        # fresh allocator, and a failed in-process attempt left HBM in a
        # state where even the host row's ~1.3 GB device_put died
        # (tools/logs/matrix_r5_tenm3.log, matrix_r5_tenm4.log).
        import subprocess

        sp = subprocess.run(
            [sys.executable,
             os.path.join("tools", "matrix_tenm_device.py")],
            capture_output=True, text=True,
            env={**os.environ, "NANORT_MATRIX_TENM_RES": str(res)},
        )
        sys.stderr.write(sp.stderr)
        got = 0
        for line in sp.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                row = json.loads(line)
                emit(row.pop("metric"), row.pop("value"),
                     row.pop("unit"), **row)
                got += 1
        if got == 0:
            emit("coherent_primary_mrays_per_s_10mtri_devicebuild",
                 -1.0, "Mrays/s",
                 error=f"subprocess rc={sp.returncode}, no rows",
                 res=res, sub=sub_t)

        # (a) quality build: native SAH host build + vectorized collapse
        t0 = time.perf_counter()
        bvh, _ = build_triangle_bvh(mesh, opt8)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        s8 = collapse_bvh8(bvh, v, f)
        collapse_s = time.perf_counter() - t0
        print(f"# 10M build {build_s:.1f}s collapse {collapse_s:.1f}s",
              file=sys.stderr, flush=True)
        s8 = s8._replace(
            nodes=jax.device_put(jnp.asarray(s8.nodes)),
            leafs=jax.device_put(jnp.asarray(s8.leafs)),
        )
        emit("coherent_primary_mrays_per_s_10mtri", time_traverse(s8),
             "Mrays/s", build_s=round(build_s, 1),
             collapse_s=round(collapse_s, 1), res=res, sub=sub_t)
        del s8, bvh

    _write()
    print("# wrote BENCH_MATRIX.json", file=sys.stderr)


if __name__ == "__main__":
    main()

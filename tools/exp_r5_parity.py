"""Headline-scale parity artifact vs the compiled C++ reference
(VERDICT r4 #2: "make the parity claim true at headline scale").

Protocol:
  1. Build the exact headline scene (1M-tri subdivided sphere) and the
     exact headline ray batch (8192^2 pinhole, bench.py camera).
  2. Trace the FULL 67M-ray batch with the shipped watertight engine
     (BVH16 tables, sub=32, detected bit-exact specializations) on the
     real TPU — the precise configuration bench.py times.
  3. Take a deterministic 1,048,576-ray subset (image stride 8 on both
     axes): every compared ray is bit-for-bit a member of the headline
     batch, and its record comes from the full-batch run.
  4. Run the same subset through the compiled reference
     (tools/ref_harness.cc: -O2, reference-default build options) on
     the host, plus a second harness binary built with
     -ffp-contract=off (g++'s default contraction differs from XLA's,
     so both contractions are reported).
  5. Compare hit masks, prim selection, and exact ulp distances of
     t/u/v on agreeing prims; verify disagreements are equal-t ties.
  6. Also byte-compare the reference's Dump'd 1M-tri BVH against our
     native SAH build at reference-default options.

Writes tools/logs/exp_r5_parity.json — the artifact BASELINE.md's
watertight row cites. Run on the real TPU: nothing here is timed, but
the records must come from the shipped TPU kernel.
"""
import json
import os
import struct
import subprocess
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

REF = "/root/reference"
RES = 8192
STRIDE = 8
SUB = 32

out = {}


def build_harness(path, extra):
    src = "tools/ref_harness.cc"
    r = subprocess.run(
        ["g++", "-O2", "-std=c++11", "-DNANORT_ENABLE_SERIALIZATION",
         f"-I{REF}"] + extra + [src, "-o", path],
        capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"harness build failed: {r.stderr[:500]}")
    return path


def ulp_dist(a, b):
    """Exact ulp distance between f32 arrays (order-isomorphic int map)."""
    ia = a.view(np.int32).astype(np.int64)
    ib = b.view(np.int32).astype(np.int64)
    ia = np.where(ia < 0, np.int64(-(2**31)) - ia, ia)
    ib = np.where(ib < 0, np.int64(-(2**31)) - ib, ib)
    return np.abs(ia - ib)


def main():
    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization, tile_image_rays, traverse_bvh8)

    v, f = make_subdivided_sphere_scene(1_000_000)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
    s16 = collapse_bvh8(bvh, v, f, width=16)
    s16 = s16._replace(nodes=jax.device_put(jnp.asarray(s16.nodes)),
                       leafs=jax.device_put(jnp.asarray(s16.leafs)))
    cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                  width=RES, height=RES, fov=60.0)
    rays = pinhole_rays(cam)
    rays_t, untile = tile_image_rays(rays, 128, 64)
    spec = detect_specialization(rays_t, sub=SUB)
    print(f"# spec {spec}", flush=True)
    hits = traverse_bvh8(s16, rays_t, sub=SUB, specialize=spec)
    img = untile(hits)  # (RES, RES) records of the full headline batch

    sl = np.s_[::STRIDE, ::STRIDE]
    t = np.asarray(img.t[sl]).reshape(-1)
    u = np.asarray(img.u[sl]).reshape(-1)
    vv = np.asarray(img.v[sl]).reshape(-1)
    pid = np.asarray(img.prim_id[sl]).reshape(-1)
    org = np.asarray(rays.org)[sl].reshape(-1, 3)
    dirs = np.asarray(rays.dir)[sl].reshape(-1, 3)
    mint = np.asarray(rays.min_t)[sl].reshape(-1)
    maxt = np.asarray(rays.max_t)[sl].reshape(-1)
    nr = t.shape[0]
    out["n_rays"] = int(nr)
    out["subset"] = f"image stride {STRIDE} of the {RES}^2 headline batch"
    out["engine"] = {"intersector": "watertight", "width": 16, "sub": SUB,
                     "specialize": list(spec) if spec else None}
    print(f"# engine records ready: {nr} rays, "
          f"hit {np.mean(pid != 0xFFFFFFFF):.3f}", flush=True)

    inp = "/tmp/parity_in.bin"
    with open(inp, "wb") as fp:
        fp.write(struct.pack("<Q", len(v)))
        fp.write(np.asarray(v, np.float32).tobytes())
        fp.write(struct.pack("<Q", len(f)))
        fp.write(np.asarray(f, np.uint32).tobytes())
        fp.write(struct.pack("<Q", nr))
        fp.write(org.astype(np.float32).tobytes())
        fp.write(dirs.astype(np.float32).tobytes())
        fp.write(mint.astype(np.float32).tobytes())
        fp.write(maxt.astype(np.float32).tobytes())

    for tag, extra in (("gxx_O2", []),
                       ("gxx_O2_nocontract", ["-ffp-contract=off"])):
        hpath = f"/tmp/ref_harness_{tag}"
        build_harness(hpath, extra)
        t0 = time.perf_counter()
        r = subprocess.run([hpath, inp, f"/tmp/parity_hits_{tag}.bin",
                            f"/tmp/parity_bvh_{tag}.bin"],
                           capture_output=True)
        dur = time.perf_counter() - t0
        if r.returncode != 0:
            out[tag] = {"error": f"rc={r.returncode}"}
            continue
        rec = np.fromfile(f"/tmp/parity_hits_{tag}.bin",
                          np.float32).reshape(nr, 4)
        rt, ru, rv = rec[:, 0].copy(), rec[:, 1].copy(), rec[:, 2].copy()
        rpid = rec[:, 3].view(np.uint32)
        rh = rpid != 0xFFFFFFFF
        gh = pid != 0xFFFFFFFF
        res = {"harness_s": round(dur, 1),
               "hit_mask_diffs": int(np.sum(rh != gh))}
        both = rh & gh
        same = both & (pid == rpid)
        diff = both & (pid != rpid)
        res["prim_agree"] = int(same.sum())
        res["prim_disagree"] = int(diff.sum())
        res["prim_agree_frac"] = float(same.sum() / max(both.sum(), 1))
        for name, ours, theirs in (("t", t, rt), ("u", u, ru),
                                   ("v", vv, rv)):
            d = ulp_dist(ours[same], theirs[same])
            res[f"{name}_ulp_max"] = int(d.max()) if d.size else 0
            res[f"{name}_ulp_mean"] = round(float(d.mean()), 4)
            res[f"{name}_bitexact_frac"] = round(
                float((d == 0).mean()), 6)
        if diff.any():
            # disagreements must be equal-t ties (traversal-order legal)
            rel = np.abs(t[diff] - rt[diff]) / np.maximum(
                np.abs(rt[diff]), 1e-30)
            res["disagree_t_relerr_max"] = float(rel.max())
        out[tag] = res
        print(f"# {tag}: {json.dumps(res)}", flush=True)

    # ---- tree byte-parity at reference defaults, headline scale ----
    from nanort_tpu import load
    ours_def, _ = build_triangle_bvh(mesh)  # reference-default options
    ref_tree = load("/tmp/parity_bvh_gxx_O2.bin")
    tree = {
        "n_nodes_ours": int(ours_def.num_nodes),
        "n_nodes_ref": int(ref_tree.num_nodes),
    }
    if ours_def.num_nodes == ref_tree.num_nodes:
        eq = True
        for field in ("bmin", "bmax", "flag", "axis", "data"):
            a = np.asarray(getattr(ours_def, field))
            b = np.asarray(getattr(ref_tree, field))
            if a.shape != b.shape or not (
                a.tobytes() == b.tobytes()
            ):
                eq = False
                tree[f"{field}_equal"] = False
        idx_eq = (np.asarray(ours_def.indices).tobytes()
                  == np.asarray(ref_tree.indices).tobytes())
        tree["nodes_byte_equal"] = bool(eq)
        tree["indices_byte_equal"] = bool(idx_eq)
    out["tree_parity_1mtri"] = tree
    print(f"# tree: {json.dumps(tree)}", flush=True)

    with open("tools/logs/exp_r5_parity.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Device-tree quality tax: is it PRIM ORDER or NODE-ROW ORDER?

r4 measured the paradox (exp_r4_devsah3): the device LBVH tree has
FEWER node pops (8.5 vs ~10) and FEWER leaf drains (12.3 vs 16.7) than
the host-SAH tree on the headline workload, yet traces ~10% SLOWER
(129 vs 142 Mrays/s). Visit counts can't explain that — a per-unit
cost must differ between the trees. The one structural difference: the
host collapse emits node rows in DFS PREORDER (a pop's child fetch
address is usually adjacent — friendly to the scalar-unit runahead /
VMEM addressing), while the device collapse numbers wide nodes by
kept-binary-node rank (scattered strides); same for leaf rows.

This experiment isolates that variable: build on device, then renumber
the finished tables into DFS preorder ON THE HOST (pure numpy
permutation — records provably identical) and measure all three:
  dev (as built)  vs  dev+preorder  vs  host-SAH.

If dev+preorder closes the gap, VERDICT r4 #4's "device SAH reorder"
should instead be a device-side preorder pass (far cheaper); if not,
the tax really is tree/prim-order quality.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.build.device_collapse import collapse_lbvh_device
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import (
    detect_specialization, tile_image_rays, traverse_bvh8)

RES = 8192
SUB = 32
results = {}


def preorder_renumber(scene):
    """Permute node + leaf rows of a width-16 scene into DFS preorder
    (slot order preserved). Pure relabeling: traversal visits the same
    nodes in the same order, records are bit-identical."""
    nodes = np.asarray(scene.nodes).copy()
    leafs = np.asarray(scene.leafs).copy()
    woop = (np.asarray(scene.leafs_woop).copy()
            if scene.leafs_woop is not None else None)
    NW = nodes.shape[0]
    NL = leafs.shape[0]
    metas = nodes[:, 96:112].astype(np.int64)
    valid = nodes[:, 0:96:6] <= nodes[:, 3:96:6]  # slot live (lo <= hi)

    node_order = []          # old ids in preorder
    leaf_order = []          # old leaf rows in first-touch order
    new_node = np.full(NW, -1, np.int64)
    new_leaf = np.full(NL, -1, np.int64)
    stack = [0]
    while stack:
        i = stack.pop()
        new_node[i] = len(node_order)
        node_order.append(i)
        kids = []
        for s in range(16):
            if not valid[i, s]:
                continue
            m = int(metas[i, s])
            if m >= 0:
                kids.append(m)
            else:
                row = -m - 1
                if new_leaf[row] < 0:
                    new_leaf[row] = len(leaf_order)
                    leaf_order.append(row)
        stack.extend(reversed(kids))  # slot 0 pops first
    # padding/unreachable rows keep their relative order at the end
    rest_n = [i for i in range(NW) if new_node[i] < 0]
    for i in rest_n:
        new_node[i] = len(node_order)
        node_order.append(i)
    rest_l = [i for i in range(NL) if new_leaf[i] < 0]
    for i in rest_l:
        new_leaf[i] = len(leaf_order)
        leaf_order.append(i)

    out = nodes[np.asarray(node_order)]
    # remap child metas in the permuted table
    om = out[:, 96:112].astype(np.int64)
    ov = out[:, 0:96:6] <= out[:, 3:96:6]
    internal = ov & (om >= 0)
    leafm = ov & (om < 0)
    remapped = np.where(internal, new_node[np.clip(om, 0, NW - 1)], om)
    remapped = np.where(
        leafm, -(new_leaf[np.clip(-om - 1, 0, NL - 1)] + 1), remapped)
    out[:, 96:112] = remapped.astype(np.float32)
    return scene._replace(
        nodes=jax.device_put(jnp.asarray(out)),
        leafs=jax.device_put(jnp.asarray(leafs[np.asarray(leaf_order)])),
        leafs_woop=(jax.device_put(jnp.asarray(
            woop[np.asarray(leaf_order)])) if woop is not None else None),
    )


def bench(tag, scene, rays_t, spec, reps=3, ref=None):
    h = traverse_bvh8(scene, rays_t, sub=SUB, specialize=spec)
    float(h.t.min())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        h = traverse_bvh8(scene, rays_t, sub=SUB, specialize=spec)
        float(h.t.min())
        ts.append(time.perf_counter() - t0)
    hd = traverse_bvh8(scene, rays_t, sub=SUB, specialize=spec,
                       debug_counts=True)
    mr = RES * RES / min(ts) / 1e6
    row = {"mrays": round(mr, 1),
           "pops": round(float(jnp.mean(hd.u)), 2),
           "drains": round(float(jnp.mean(hd.v)), 2)}
    if ref is not None:
        row["prim_diffs"] = int(np.sum(
            np.asarray(h.prim_id) != np.asarray(ref.prim_id)))
        row["t_diffs"] = int(np.sum(
            np.asarray(h.t) != np.asarray(ref.t)))
    results[tag] = row
    print(f"# {tag}: {json.dumps(row)}", flush=True)
    return h


def main():
    v, f = make_subdivided_sphere_scene(1_000_000)
    cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                  width=RES, height=RES, fov=60.0)
    rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
    spec = detect_specialization(rays_t, sub=SUB)
    print(f"# spec {spec}", flush=True)

    vd = jax.device_put(jnp.asarray(v))
    fd = jax.device_put(jnp.asarray(f))
    t0 = time.perf_counter()
    sd = collapse_lbvh_device(vd, fd, width=16, max_leaf=9)
    float(np.asarray(sd.nodes[0, 0]))
    print(f"# device build {time.perf_counter()-t0:.1f}s "
          f"({sd.num_nodes} nodes)", flush=True)
    h_dev = bench("dev_asbuilt", sd, rays_t, spec)

    t0 = time.perf_counter()
    sp = preorder_renumber(sd)
    print(f"# host preorder renumber {time.perf_counter()-t0:.1f}s",
          flush=True)
    bench("dev_preorder", sp, rays_t, spec, ref=h_dev)
    del sd, sp

    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
    s16 = collapse_bvh8(bvh, v, f, width=16)
    s16 = s16._replace(nodes=jax.device_put(jnp.asarray(s16.nodes)),
                       leafs=jax.device_put(jnp.asarray(s16.leafs)))
    bench("host_sah", s16, rays_t, spec)

    with open("tools/logs/exp_r5_devorder.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Drive the Pallas BVH8 packet kernel on real TPU and check parity vs the
brute-force oracle. Run: python tools/verify_pallas.py"""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from nanort_tpu import BVHBuildOptions, BVHTraceOptions, build_triangle_bvh, brute_force_traverse, make_rays
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_uv_sphere, make_cornell_box, merge_meshes
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import traverse_bvh8

v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(16, 32, 0.5))
mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
opts = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
bvh, _ = build_triangle_bvh(mesh, opts)
s8 = collapse_bvh8(bvh, v, f)
print(f"scene {len(f)} tris, BVH8 {s8.num_nodes} nodes, {s8.num_leaf_rows} leaf rows, depth {s8.depth}")

rng = np.random.default_rng(5)
n = 3000  # odd size exercises padding
org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
tgt = rng.uniform(-0.8, 0.8, (n, 3))
d = (tgt - org); d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays = make_rays(org, d.astype(np.float32))

t0 = time.perf_counter()
got = traverse_bvh8(s8, rays)
got = jax.tree_util.tree_map(np.asarray, got)
print(f"kernel first call (incl compile): {time.perf_counter()-t0:.1f}s")
want = jax.tree_util.tree_map(np.asarray, brute_force_traverse(mesh, rays))

gh = got.prim_id != 0xFFFFFFFF
wh = want.prim_id != 0xFFFFFFFF
print("hit agree:", (gh == wh).all(), f"({gh.sum()}/{n} hits)")
m = gh & wh
same = got.prim_id[m] == want.prim_id[m]
print(f"prim agree: {same.mean()*100:.2f}%")
print("t exact where same prim:", np.array_equal(got.t[m][same], want.t[m][same]))
diff = ~same
if diff.any():
    print("t close where prim differs (ties):", np.allclose(got.t[m][diff], want.t[m][diff], rtol=1e-6))
print("u/v exact where same prim:", np.array_equal(got.u[m][same], want.u[m][same]), np.array_equal(got.v[m][same], want.v[m][same]))

second = traverse_bvh8(s8, rays, skip_prim_id=jnp.asarray(got.prim_id))
second = jax.tree_util.tree_map(np.asarray, second)
bad = (second.prim_id[m] == got.prim_id[m]) & (got.prim_id[m] != 0xFFFFFFFF)
print("skip works:", not bad.any())

culled = traverse_bvh8(s8, rays, BVHTraceOptions(cull_back_face=True))
culled = jax.tree_util.tree_map(np.asarray, culled)
wantc = jax.tree_util.tree_map(np.asarray, brute_force_traverse(mesh, rays, BVHTraceOptions(cull_back_face=True)))
print("cull hits agree:", ((culled.prim_id != 0xFFFFFFFF) == (wantc.prim_id != 0xFFFFFFFF)).all())

# prim_ids_range window filter (reference nanort.h:1054-1063)
optr = BVHTraceOptions(prim_ids_range=(100, 900))
ranged = jax.tree_util.tree_map(np.asarray, traverse_bvh8(s8, rays, optr))
wantr = jax.tree_util.tree_map(np.asarray, brute_force_traverse(mesh, rays, optr))
rh = ranged.prim_id != 0xFFFFFFFF
wrh = wantr.prim_id != 0xFFFFFFFF
print("range hits agree:", (rh == wrh).all(), f"({rh.sum()} hits)")
mr = rh & wrh
samer = ranged.prim_id[mr] == wantr.prim_id[mr]
print(f"range prim agree: {samer.mean()*100:.2f}%",
      "in-window:", ((ranged.prim_id[rh] >= 100) & (ranged.prim_id[rh] < 900)).all())

# occlusion mode: any-hit flags + per-ray hit distance reporting
occ = jax.tree_util.tree_map(np.asarray, traverse_bvh8(s8, rays, occlusion=True))
oh = occ.prim_id != 0xFFFFFFFF
print("occlusion hit agree:", (oh == wh).all())
# reported (t, prim) must be a genuine intersection: member of the
# K-nearest oracle list for that ray, and >= the nearest distance
from nanort_tpu.traverse.multi_hit import brute_force_multi_hit
mh = jax.tree_util.tree_map(np.asarray, brute_force_multi_hit(mesh, rays, 32))
ridx = np.nonzero(oh)[0]
member = np.zeros(ridx.shape[0], bool)
for j, r in enumerate(ridx):
    k = np.nonzero(mh.prim_id[r] == occ.prim_id[r])[0]
    member[j] = k.size > 0 and np.allclose(mh.t[r, k[0]], occ.t[r], rtol=1e-5)
print("occ (t,prim) genuine:", member.all(),
      "occ t >= nearest:", (occ.t[oh] >= want.t[oh] * (1 - 1e-5)).all())

"""Full dual-packet kernel prototype: two independent (sub,128) ray
packets per kernel instance, node slab chains interleaved so their
vector->scalar syncs overlap, leaves drained per side sequentially.
Finished sides park on the DUMMY row (the old profile_interleave.py
prototype re-read the root and resurrected finished sides — that, not
just lockstep, inflated its iteration counts).

Verifies exact parity vs the production kernel, then benches 8192^2.
"""
import sys, time, functools
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import tile_image_rays, traverse_bvh8
from nanort_tpu.models.cameras import look_at, pinhole_rays

LANES = 128


def make_dual_kernel(n_blocks, sub, leaf_unroll, park_row, vmem_mb=116):
    """One block = 2 packets of (sub, LANES); side s = sublanes
    [s*sub, (s+1)*sub)."""

    def body(nodes_ref, leafs_ref, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
             mint_r, maxt_r, t_out, u_out, v_out, pid_out, stack_ref, leafq_ref):
        f32 = jnp.float32
        eps = f32(np.finfo(np.float32).eps)
        inf = f32(np.inf)
        MM = f32(1.00000024)

        def sinv(d):
            tiny = jnp.abs(d) < eps
            neg = jax.lax.bitcast_convert_type(d, jnp.int32) < 0
            return jnp.where(tiny, jnp.where(neg, -inf, inf),
                             1.0 / jnp.where(tiny, 1.0, d))

        def comp(vx, vy, vz, k):
            return jnp.where(k == 0, vx, jnp.where(k == 1, vy, vz))

        # ---- per-side constants ----
        S = []
        for s in range(2):
            sl = slice(s * sub, (s + 1) * sub)
            ox, oy, oz = ox_r[sl, :], oy_r[sl, :], oz_r[sl, :]
            dx, dy, dz = dx_r[sl, :], dy_r[sl, :], dz_r[sl, :]
            mint, maxt = mint_r[sl, :], maxt_r[sl, :]
            ix, iy, iz = sinv(dx), sinv(dy), sinv(dz)
            nx, ny, nz = dx < 0, dy < 0, dz < 0
            adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
            kz = jnp.where(ady > adx, 1, 0)
            amax = jnp.where(ady > adx, ady, adx)
            kz = jnp.where(adz > amax, 2, kz).astype(jnp.int32)
            kx = (kz + 1) % 3
            ky = (kx + 1) % 3
            dkz = comp(dx, dy, dz, kz)
            negk = dkz < 0
            kx, ky = jnp.where(negk, ky, kx), jnp.where(negk, kx, ky)
            sx = comp(dx, dy, dz, kx) / dkz
            sy = comp(dx, dy, dz, ky) / dkz
            sz = 1.0 / dkz
            neg_ax = (dx_r[s * sub, 0] < 0, dy_r[s * sub, 0] < 0,
                      dz_r[s * sub, 0] < 0)
            S.append(dict(ox=ox, oy=oy, oz=oz, ix=ix, iy=iy, iz=iz,
                          nx=nx, ny=ny, nz=nz, mint=mint, maxt=maxt,
                          kx=kx, ky=ky, kz=kz, sx=sx, sy=sy, sz=sz,
                          neg_ax=neg_ax))

        SOFF = 512  # per-side stack offset
        stack_ref[0] = 0
        stack_ref[SOFF] = 0
        PARK = jnp.int32(park_row)

        def slab_mask(sd, row, t_b):
            m = None
            for cc in range(8):
                b0x, b0y, b0z = row[0, 8*cc], row[0, 8*cc+1], row[0, 8*cc+2]
                b1x, b1y, b1z = row[0, 8*cc+3], row[0, 8*cc+4], row[0, 8*cc+5]
                lox = jnp.where(sd["nx"], b1x, b0x)
                hix = jnp.where(sd["nx"], b0x, b1x)
                loy = jnp.where(sd["ny"], b1y, b0y)
                hiy = jnp.where(sd["ny"], b0y, b1y)
                loz = jnp.where(sd["nz"], b1z, b0z)
                hiz = jnp.where(sd["nz"], b0z, b1z)
                tmin = sd["mint"]
                for tv in ((lox - sd["ox"]) * sd["ix"],
                           (loy - sd["oy"]) * sd["iy"],
                           (loz - sd["oz"]) * sd["iz"]):
                    tmin = jnp.where(tv > tmin, tv, tmin)
                tmax = t_b
                for tv in ((hix - sd["ox"]) * sd["ix"] * MM,
                           (hiy - sd["oy"]) * sd["iy"] * MM,
                           (hiz - sd["oz"]) * sd["iz"] * MM):
                    tmax = jnp.where(tv < tmax, tv, tmax)
                h = (tmin <= tmax).astype(jnp.int32) << cc
                m = h if m is None else m | h
            for sh in (64, 32, 16, 8, 4, 2, 1):
                m = m | pltpu.roll(m, sh, axis=1)
            sh = 1
            while sh < m.shape[0]:
                m = m | pltpu.roll(m, sh, axis=0)
                sh *= 2
            return m

        def leaf_test(sd, lrow, cnt, carry):
            t_b, u_b, v_b, p_b = carry
            kx, ky, kz = sd["kx"], sd["ky"], sd["kz"]
            sx, sy, sz = sd["sx"], sd["sy"], sd["sz"]
            ox, oy, oz = sd["ox"], sd["oy"], sd["oz"]
            for ti in range(leaf_unroll):
                p0x, p0y, p0z = lrow[0, 9*ti], lrow[0, 9*ti+1], lrow[0, 9*ti+2]
                p1x, p1y, p1z = lrow[0, 9*ti+3], lrow[0, 9*ti+4], lrow[0, 9*ti+5]
                p2x, p2y, p2z = lrow[0, 9*ti+6], lrow[0, 9*ti+7], lrow[0, 9*ti+8]
                pid_t = lrow[0, 90 + ti].astype(jnp.int32)
                ax_, ay_, az_ = p0x - ox, p0y - oy, p0z - oz
                bx_, by_, bz_ = p1x - ox, p1y - oy, p1z - oz
                cx_, cy_, cz_ = p2x - ox, p2y - oy, p2z - oz
                Az = comp(ax_, ay_, az_, kz)
                Bz = comp(bx_, by_, bz_, kz)
                Cz = comp(cx_, cy_, cz_, kz)
                Ax = comp(ax_, ay_, az_, kx) - sx * Az
                Ay = comp(ax_, ay_, az_, ky) - sy * Az
                Bx = comp(bx_, by_, bz_, kx) - sx * Bz
                By = comp(bx_, by_, bz_, ky) - sy * Bz
                Cx = comp(cx_, cy_, cz_, kx) - sx * Cz
                Cy = comp(cx_, cy_, cz_, ky) - sy * Cz
                U = Cx * By - Cy * Bx
                V = Ax * Cy - Ay * Cx
                W = Bx * Ay - By * Ax
                any_neg = (U < 0.0) | (V < 0.0) | (W < 0.0)
                any_pos = (U > 0.0) | (V > 0.0) | (W > 0.0)
                edge_ok = ~(any_neg & any_pos)
                det = U + V + W
                det_ok = det != 0.0
                rcp = 1.0 / jnp.where(det_ok, det, 1.0)
                tt = (U * (sz * Az) + V * (sz * Bz) + W * (sz * Cz)) * rcp
                valid = edge_ok & det_ok & (tt <= t_b) & (tt >= sd["mint"])
                valid = valid & (ti < cnt)
                t_b = jnp.where(valid, tt, t_b)
                u_b = jnp.where(valid, V * rcp, u_b)
                v_b = jnp.where(valid, W * rcp, v_b)
                p_b = jnp.where(valid, pid_t, p_b)
            return t_b, u_b, v_b, p_b

        def push_children(sd, row, mask, sp, soff, qoff, leafq_ref):
            """Production semantics: internal children to the stack,
            leaf children to this side's SMEM leaf queue."""
            axis_f = row[0, 80]
            neg = jnp.where(axis_f == 0.0, sd["neg_ax"][0],
                            jnp.where(axis_f == 1.0, sd["neg_ax"][1],
                                      sd["neg_ax"][2]))
            lq = jnp.int32(0)
            for j in range(8):
                cc = jnp.where(neg, j, 7 - j)
                bit = (mask >> cc) & 1
                meta = jnp.where(neg, row[0, 64 + j],
                                 row[0, 71 - j]).astype(jnp.int32)
                cnt = jnp.where(neg, row[0, 72 + j],
                                row[0, 79 - j]).astype(jnp.int32)
                internal = (meta >= 0).astype(jnp.int32)
                stack_ref[soff + sp] = meta
                sp = sp + bit * internal
                leafq_ref[qoff + lq] = ((-meta - 1) << 4) | (cnt & 15)
                lq = lq + bit * (1 - internal)
            return sp, lq

        def outer(state):
            spA, spB, tA, uA, vA, pA, tB, uB, vB, pB = state

            def node_cond(c):
                spA, spB, lqA, lqB = c
                return ((spA > 0) | (spB > 0)) & (lqA < 1) & (lqB < 1)

            def node_step(c):
                spA, spB, lqA, lqB = c
                actA = (spA > 0).astype(jnp.int32)
                actB = (spB > 0).astype(jnp.int32)
                spA2 = spA - actA
                spB2 = spB - actB
                # finished sides park on the dummy row: empty boxes, no
                # mask bits, no pushes
                idxA = jnp.where(actA == 1, stack_ref[jnp.maximum(spA2, 0)],
                                 PARK)
                idxB = jnp.where(actB == 1,
                                 stack_ref[SOFF + jnp.maximum(spB2, 0)],
                                 PARK)
                rowA = nodes_ref[pl.ds(idxA, 1), :]
                rowB = nodes_ref[pl.ds(idxB, 1), :]
                mA = slab_mask(S[0], rowA, tA)
                mB = slab_mask(S[1], rowB, tB)
                maskA = mA[0, 0]
                maskB = mB[0, 0]
                spA3, dlqA = push_children(S[0], rowA, maskA, spA2, 0, 0,
                                           leafq_ref)
                spB3, dlqB = push_children(S[1], rowB, maskB, spB2, SOFF,
                                           32, leafq_ref)
                return (spA3, spB3, lqA + dlqA, lqB + dlqB)

            spA, spB, lqA, lqB = jax.lax.while_loop(
                node_cond, node_step,
                (spA, spB, jnp.int32(0), jnp.int32(0)))

            def drainA(q, carry):
                packed = leafq_ref[q]
                lrow = leafs_ref[pl.ds(packed >> 4, 1), :]
                return leaf_test(S[0], lrow, packed & 15, carry)

            def drainB(q, carry):
                packed = leafq_ref[32 + q]
                lrow = leafs_ref[pl.ds(packed >> 4, 1), :]
                return leaf_test(S[1], lrow, packed & 15, carry)

            tA, uA, vA, pA = jax.lax.fori_loop(0, lqA, drainA,
                                               (tA, uA, vA, pA))
            tB, uB, vB, pB = jax.lax.fori_loop(0, lqB, drainB,
                                               (tB, uB, vB, pB))
            return (spA, spB, tA, uA, vA, pA, tB, uB, vB, pB)

        z = lambda s: jnp.zeros(S[s]["maxt"].shape, jnp.float32)
        mp = lambda s: jnp.full(S[s]["maxt"].shape, -1, jnp.int32)
        st = (jnp.int32(1), jnp.int32(1),
              S[0]["maxt"], z(0), z(0), mp(0),
              S[1]["maxt"], z(1), z(1), mp(1))
        st = jax.lax.while_loop(
            lambda c: (c[0] > 0) | (c[1] > 0), outer, st)
        _, _, tA, uA, vA, pA, tB, uB, vB, pB = st
        t_out[0:sub, :] = tA
        t_out[sub:2*sub, :] = tB
        u_out[0:sub, :] = uA
        u_out[sub:2*sub, :] = uB
        v_out[0:sub, :] = vA
        v_out[sub:2*sub, :] = vB
        pid_out[0:sub, :] = pA
        pid_out[sub:2*sub, :] = pB

    ray_spec = pl.BlockSpec((None, 2*sub, LANES), lambda i: (i, 0, 0))
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        body,
        grid=(n_blocks,),
        in_specs=[full, full] + [ray_spec] * 8,
        out_specs=(ray_spec,) * 4,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_blocks, 2*sub, LANES), d)
            for d in (jnp.float32, jnp.float32, jnp.float32, jnp.int32)),
        scratch_shapes=[pltpu.SMEM((1024,), jnp.int32),
                        pltpu.SMEM((64,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
    ))


# ---------------- driver ----------------
v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
bvh, _ = build_triangle_bvh(mesh, BVHBuildOptions(
    min_leaf_primitives=8, max_leaf_primitives=8))
s8 = collapse_bvh8(bvh, v, f)
nodes_d = jax.device_put(jnp.asarray(s8.nodes))
leafs_d = jax.device_put(jnp.asarray(s8.leafs))
s8d = s8._replace(nodes=nodes_d, leafs=leafs_d)
PARK_ROW = s8.num_nodes  # the dummy row

SUB = 16  # per side -> blocks of (32,128), same block shape as production

def run_dual(rays_flat, n):
    n_blocks = n // (2 * SUB * LANES)
    prep = lambda x: x.reshape(n_blocks, 2 * SUB, LANES)
    kern = make_dual_kernel(n_blocks, SUB, s8.max_leaf, PARK_ROW)
    return kern(nodes_d, leafs_d,
                prep(rays_flat.org[:, 0]), prep(rays_flat.org[:, 1]),
                prep(rays_flat.org[:, 2]), prep(rays_flat.dir[:, 0]),
                prep(rays_flat.dir[:, 1]), prep(rays_flat.dir[:, 2]),
                prep(rays_flat.min_t), prep(rays_flat.max_t))

# ---- parity on a small set ----
res = 1024
cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0), width=res, height=res,
              fov=60.0)
rays_s, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
t0 = time.perf_counter()
t, u, vv, pid = run_dual(rays_s, res * res)
t = np.asarray(t); pid = np.asarray(pid)
print(f"dual first call {time.perf_counter()-t0:.1f}s")
ref = traverse_bvh8(s8d, rays_s)
rt = np.asarray(ref.t); rp = np.asarray(ref.prim_id).astype(np.int32)
rh = rp != -1
th = t.reshape(-1) < np.asarray(rays_s.max_t)
print("hit masks equal:", (rh == th).all(), f"({rh.sum()}/{res*res})")
m = rh & th
same = pid.reshape(-1)[m] == rp[m]
print(f"prim agree {same.mean()*100:.3f}%, t equal where same: "
      f"{np.array_equal(t.reshape(-1)[m][same], rt[m][same])}")

# ---- bench 8192^2 ----
res = 8192
cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0), width=res, height=res,
              fov=60.0)
rays_b, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
t0 = time.perf_counter()
out = run_dual(rays_b, res * res)
print(f"bench first call {time.perf_counter()-t0:.1f}s "
      f"(tmin {float(out[0].min()):.4f})")
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    out = run_dual(rays_b, res * res)
    _ = float(out[0].min())
    ts.append(time.perf_counter() - t0)
best = min(ts)
print(f"dual: {best*1e3:.0f} ms -> {res*res/best/1e6:.1f} Mrays/s "
      f"(production currently 112)")

"""Interleave 2 packets per kernel instance: do their independent
vector->scalar syncs overlap? Node-phase only, vs single-packet control."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import tile_image_rays
from nanort_tpu.models.cameras import look_at, pinhole_rays

SUB = 8
LANES = 128
v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
opts = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
bvh, _ = build_triangle_bvh(mesh, opts)
s8 = collapse_bvh8(bvh, v, f)
cam = look_at(eye=(0,0,2.2), center=(0,0,0), width=1024, height=1024, fov=60.0)
rays, _ = tile_image_rays(pinhole_rays(cam), 32, 32)
R = 1024*1024
NPK = R // (SUB*LANES)  # 1024 packets of (8,128)

prep = lambda x: jnp.asarray(x).reshape(NPK, SUB, LANES)
org = rays.org; dirs = rays.dir
fields = [prep(org[:,0]), prep(org[:,1]), prep(org[:,2]),
          prep(dirs[:,0]), prep(dirs[:,1]), prep(dirs[:,2]),
          prep(rays.min_t), prep(rays.max_t)]
nodes_d = jax.device_put(jnp.asarray(s8.nodes))

def make(two):
    K = 2 if two else 1
    def kern(nodes_ref, *refs):
        ray_refs = refs[:8]
        cnt_out = refs[8]
        stack_ref = refs[9]
        f32 = jnp.float32
        eps = f32(np.finfo(np.float32).eps); inf = f32(np.inf)
        def sinv(d):
            tiny = jnp.abs(d) < eps
            neg = jax.lax.bitcast_convert_type(d, jnp.int32) < 0
            return jnp.where(tiny, jnp.where(neg, -inf, inf), 1.0/jnp.where(tiny,1.0,d))
        MM = f32(1.00000024)
        # per-side ray constants: side s uses sublane block s
        sides = []
        for s_i in range(K):
            sl = slice(s_i*SUB, (s_i+1)*SUB)
            ox, oy, oz = ray_refs[0][sl,:], ray_refs[1][sl,:], ray_refs[2][sl,:]
            dx, dy, dz = ray_refs[3][sl,:], ray_refs[4][sl,:], ray_refs[5][sl,:]
            mint = ray_refs[6][sl,:]; maxt = ray_refs[7][sl,:]
            sides.append((ox,oy,oz,sinv(dx),sinv(dy),sinv(dz),dx<0,dy<0,dz<0,mint,maxt))
        for s_i in range(K):
            stack_ref[s_i*256] = 0
        def slab(side, row):
            ox,oy,oz,ix,iy,iz,nx,ny,nz,mint,maxt = side
            m = None
            for cc in range(8):
                b = [row[0, 8*cc+k] for k in range(6)]
                lox = jnp.where(nx, b[3], b[0]); hix = jnp.where(nx, b[0], b[3])
                loy = jnp.where(ny, b[4], b[1]); hiy = jnp.where(ny, b[1], b[4])
                loz = jnp.where(nz, b[5], b[2]); hiz = jnp.where(nz, b[2], b[5])
                tmin = mint
                for tv in ((lox-ox)*ix, (loy-oy)*iy, (loz-oz)*iz):
                    tmin = jnp.where(tv > tmin, tv, tmin)
                tmax = maxt
                for tv in ((hix-ox)*ix*MM, (hiy-oy)*iy*MM, (hiz-oz)*iz*MM):
                    tmax = jnp.where(tv < tmax, tv, tmax)
                h = (tmin <= tmax).astype(jnp.int32) << cc
                m = h if m is None else m | h
            for sh in (64,32,16,8,4,2,1):
                m = m | pltpu.roll(m, sh, axis=1)
            sh = 1
            while sh < m.shape[0]:
                m = m | pltpu.roll(m, sh, axis=0); sh *= 2
            return m

        def step(c):
            sps = list(c[:K]); nst = c[K]
            ms = []
            rows = []
            for s_i in range(K):
                sp = sps[s_i]
                act = sp > 0
                sp = sp - act.astype(jnp.int32)
                raw = stack_ref[s_i*256 + jnp.maximum(sp, 0)]
                idx = jnp.where(act, raw, 0)
                rows.append(nodes_ref[pl.ds(idx, 1), :])
                sps[s_i] = sp
            for s_i in range(K):
                ms.append(slab(sides[s_i], rows[s_i]))
            for s_i in range(K):
                mask = ms[s_i][0, 0]
                sp = sps[s_i]
                row = rows[s_i]
                for cc in range(8):
                    bit = (mask >> cc) & 1
                    meta = row[0, 64+cc].astype(jnp.int32)
                    internal = (meta >= 0).astype(jnp.int32)
                    stack_ref[s_i*256 + sp] = meta
                    sp = sp + bit*internal
                sps[s_i] = jnp.minimum(sp, 250)
            return (*sps, nst+1)

        def cond(c):
            any_w = c[0] > 0
            for s_i in range(1, K):
                any_w = any_w | (c[s_i] > 0)
            return any_w & (c[K] < 400)
        init = tuple([jnp.int32(1)]*K + [jnp.int32(0)])
        out = jax.lax.while_loop(cond, step, init)
        cnt_out[0, 0] = out[K]
    return kern

for two in (False, True):
    K = 2 if two else 1
    npk = NPK // K
    ray_spec = pl.BlockSpec((None, SUB*K, LANES), lambda i: (i, 0, 0))
    reshaped = [x.reshape(npk, SUB*K, LANES) for x in fields]
    kfn = jax.jit(pl.pallas_call(
        make(two), grid=(npk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec]*8,
        out_specs=pl.BlockSpec((None, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((npk, 1, 2), jnp.int32),
        scratch_shapes=[pltpu.SMEM((256*K,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110*1024*1024),
    ))
    cnt = np.asarray(kfn(nodes_d, *reshaped))
    t0=time.perf_counter(); cnt = np.asarray(kfn(nodes_d, *reshaped)); dt=time.perf_counter()-t0
    iters = cnt[:,0,0].astype(np.int64).sum()
    nodes_done = iters * K  # approx
    print(f"K={K}: {dt*1e3:.0f} ms, {iters} iters -> {(dt-0.028)/max(iters,1)*1e9:.0f} ns/iter ({(dt-0.028)/max(nodes_done,1)*1e9:.0f} ns/node)", flush=True)

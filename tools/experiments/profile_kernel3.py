"""Sync-pipelined node phase: extract step i-1's mask during step i."""
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

SUB = 16
LANES = 128
v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
opts = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
bvh, _ = build_triangle_bvh(mesh, opts)
s8 = collapse_bvh8(bvh, v, f)
N8 = s8.num_nodes
# add a dummy empty row at the end (index N8): inverted boxes, metas 0
nodes_pad = np.concatenate([s8.nodes, np.zeros((1,128), np.float32)])
nodes_pad[N8, 0:64:8] = 3e38; nodes_pad[N8, 3:64:8] = -3e38
cam = look_at(eye=(0,0,2.2), center=(0,0,0), width=1024, height=1024, fov=60.0)
rays, _ = tile_image_rays(pinhole_rays(cam), 32, 64)
R = 1024*1024
n_packets = R // (SUB*LANES)
prep = lambda x: jnp.asarray(x).reshape(n_packets, SUB, LANES)
org = rays.org; dirs = rays.dir
args8 = (prep(org[:,0]), prep(org[:,1]), prep(org[:,2]),
         prep(dirs[:,0]), prep(dirs[:,1]), prep(dirs[:,2]),
         prep(rays.min_t), prep(rays.max_t))
nodes_d = jax.device_put(jnp.asarray(nodes_pad))

DUMMY = N8

def kern(nodes_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, mint_ref, maxt_ref, cnt_out, stack_ref):
    f32 = jnp.float32
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    min_t = mint_ref[:]; max_t = maxt_ref[:]
    eps = f32(np.finfo(np.float32).eps); inf = f32(np.inf)
    def sinv(d):
        tiny = jnp.abs(d) < eps
        neg = jax.lax.bitcast_convert_type(d, jnp.int32) < 0
        return jnp.where(tiny, jnp.where(neg, -inf, inf), 1.0/jnp.where(tiny,1.0,d))
    ix, iy, iz = sinv(dx), sinv(dy), sinv(dz)
    nx, ny, nz = dx<0, dy<0, dz<0
    MM = f32(1.00000024)
    t_b = max_t

    def slab_mask(row):
        m = None
        for cc in range(8):
            b = [row[0, 8*cc+k] for k in range(6)]
            lox = jnp.where(nx, b[3], b[0]); hix = jnp.where(nx, b[0], b[3])
            loy = jnp.where(ny, b[4], b[1]); hiy = jnp.where(ny, b[1], b[4])
            loz = jnp.where(nz, b[5], b[2]); hiz = jnp.where(nz, b[2], b[5])
            tmin = min_t
            for tv in ((lox-ox)*ix, (loy-oy)*iy, (loz-oz)*iz):
                tmin = jnp.where(tv > tmin, tv, tmin)
            tmax = t_b
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

    def metas_of(row):
        return [row[0, 64+cc].astype(jnp.int32) for cc in range(8)]

    def node_step(c):
        # depth-2 pipeline: slabs issued for idx_cur; mask extracted for
        # the node from TWO iterations ago (m_p2/idx_p2)
        sp, idx_cur, m_p1, idx_p1, m_p2, idx_p2, nst, nleaf = c
        row_cur = nodes_ref[pl.ds(idx_cur, 1), :]
        m_cur = slab_mask(row_cur)
        mask = m_p2[0, 0]
        row_p2 = nodes_ref[pl.ds(idx_p2, 1), :]
        for cc in range(8):
            bit = (mask >> cc) & 1
            meta = row_p2[0, 64+cc].astype(jnp.int32)
            internal = (meta >= 0).astype(jnp.int32)
            stack_ref[sp] = meta
            sp = sp + bit*internal
            nleaf = nleaf + bit*(1-internal)
        has = (sp > 0).astype(jnp.int32)
        sp = sp - has
        idx_next = jnp.where(has == 1, stack_ref[sp], DUMMY)
        return sp, idx_next, m_cur, idx_cur, m_p1, idx_p1, nst+1, nleaf

    def cond(c):
        return (c[0] > 0) | (c[1] != DUMMY) | (c[3] != DUMMY) | (c[5] != DUMMY)

    z = jnp.zeros((SUB, LANES), jnp.int32)
    out = jax.lax.while_loop(cond, node_step,
        (jnp.int32(0), jnp.int32(0), z, jnp.int32(DUMMY), z, jnp.int32(DUMMY),
         jnp.int32(0), jnp.int32(0)))
    cnt_out[0,0] = out[6]
    cnt_out[0,1] = out[7]

ray_spec = pl.BlockSpec((None, SUB, LANES), lambda i: (i, 0, 0))
kfn = jax.jit(pl.pallas_call(
    kern, grid=(n_packets,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec]*8,
    out_specs=pl.BlockSpec((None, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
    out_shape=jax.ShapeDtypeStruct((n_packets, 1, 2), jnp.int32),
    scratch_shapes=[pltpu.SMEM((512,), jnp.int32)],
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=115*1024*1024),
))
cnt = np.asarray(kfn(nodes_d, *args8))
t0=time.perf_counter(); cnt = np.asarray(kfn(nodes_d, *args8)); dt=time.perf_counter()-t0
steps = cnt[:,0,0].astype(np.int64).sum()
leaf = cnt[:,0,1].astype(np.int64).sum()
print(f"pipelined: {dt*1e3:.0f} ms, {steps} steps ({steps/n_packets:.0f}/packet), {leaf/n_packets:.0f} leaves/packet -> {(dt-0.028)/max(steps,1)*1e9:.0f} ns/step", flush=True)

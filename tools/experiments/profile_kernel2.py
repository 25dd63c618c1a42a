"""Isolate node-step costs: full vs no-scalar-meta vs no-extract."""
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
cam = look_at(eye=(0,0,2.2), center=(0,0,0), width=1024, height=1024, fov=60.0)
rays, _ = tile_image_rays(pinhole_rays(cam), 32, 64)
R = 1024*1024
n_packets = R // (SUB*LANES)
prep = lambda x: jnp.asarray(x).reshape(n_packets, SUB, LANES)
org = rays.org; dirs = rays.dir
args8 = (prep(org[:,0]), prep(org[:,1]), prep(org[:,2]),
         prep(dirs[:,0]), prep(dirs[:,1]), prep(dirs[:,2]),
         prep(rays.min_t), prep(rays.max_t))
nodes_d = jax.device_put(jnp.asarray(s8.nodes))

def make(variant):
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
        stack_ref[0] = 0
        t_b = max_t
        def node_step(c):
            sp, nst = c
            sp = sp - 1
            idx = stack_ref[sp]
            row = nodes_ref[pl.ds(idx,1), :]
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
            if variant == "noextract":
                # no cross-tile reduce, fixed walk: pop-only (fake)
                mask = jnp.int32(0)
            else:
                for sh in (64,32,16,8,4,2,1):
                    m = m | pltpu.roll(m, sh, axis=1)
                sh = 1
                while sh < m.shape[0]:
                    m = m | pltpu.roll(m, sh, axis=0); sh *= 2
                mask = m[0,0]
            if variant == "full":
                for cc in range(8):
                    bit = (mask >> cc) & 1
                    meta = row[0, 64+cc].astype(jnp.int32)
                    internal = (meta >= 0).astype(jnp.int32)
                    stack_ref[sp] = meta
                    sp = sp + bit*internal
            elif variant == "nometa":
                # use mask but no per-child row extraction: push fake ids
                stack_ref[sp] = (idx * 2 + 1) % 57000
                sp = jnp.maximum(sp + (mask & 1), 1)
            else:  # noextract
                stack_ref[sp] = (idx * 2 + 1) % 57000
                sp = jnp.maximum(sp + ((idx ^ nst) & 1), 1)
            return sp, nst+1
        sp, nst = jax.lax.while_loop(lambda c: (c[0] > 0) & (c[1] < 170), node_step, (jnp.int32(1), jnp.int32(0)))
        cnt_out[0,0] = nst
        cnt_out[0,1] = sp
    return kern

ray_spec = pl.BlockSpec((None, SUB, LANES), lambda i: (i, 0, 0))
for variant in ("nometa", "noextract", "full"):
    kfn = jax.jit(pl.pallas_call(
        make(variant), grid=(n_packets,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec]*8,
        out_specs=pl.BlockSpec((None, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_packets, 1, 2), jnp.int32),
        scratch_shapes=[pltpu.SMEM((256,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=115*1024*1024),
    ))
    cnt = np.asarray(kfn(nodes_d, *args8))
    t0=time.perf_counter(); cnt = np.asarray(kfn(nodes_d, *args8)); dt=time.perf_counter()-t0
    steps = cnt[:,0,0].astype(np.int64).sum()
    print(f"{variant}: {dt*1e3:.0f} ms, {steps} steps -> {dt/max(steps,1)*1e9:.0f} ns/step", flush=True)

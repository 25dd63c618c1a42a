"""Fused ambient-occlusion megakernel: primary hit + all hemisphere
occlusion samples in ONE Pallas kernel launch.

The shipped AO recipe (models/objrender.render_ao) launches a primary
packet traversal, assembles occlusion megabatches on the host-side XLA
graph, and launches a second any-hit traversal — ~2x the kernel time in
dispatch/megabatch overhead at 512^2 (exp_r3_ao2: primary 41 ms +
occlusion 163 ms for a ~16 ms compute core). This kernel does the whole
config-A pass on-core (reference loop: examples/objrender/main.cc:581-709
+ the AO variant in the gui renderer):

  per pixel block: watertight closest-hit (traverse/fused_trace.py,
  in-kernel BVH16) -> geometric normal from the aux table -> flip toward
  the ray -> Frisvad ONB -> n_samples occlusion traversals with the
  caller-supplied cosine-hemisphere directions -> unoccluded fraction.

Bit-parity: hemisphere directions are generated OUTSIDE the kernel with
the exact same jax.random draws as render_ao; the in-kernel watertight
test + Dekker exact-edge fallback is op-for-op the packet kernel's; the
normal/ONB/offset arithmetic mirrors render_ao line by line. The AO
image therefore matches render_ao bit-for-bit except where closest-hit
ties at exactly-equal t resolve to a different (coplanar-overlap) prim
— the repo-wide tie contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.ray import Hits
from ..traverse.fused_trace import fused_scratch_shapes, make_tracer

LANES = 128


def _ao_kernel(S, max_leaf, sub, ao_radius,
               nodes_ref, leafs_ref, aux_ref, rays_ref,
               ao_ref, t_ref, u_ref, v_ref, p_ref, h_ref,
               stack_ref, leafq_ref):
    f32 = jnp.float32
    tracer = make_tracer(nodes_ref, leafs_ref, stack_ref, leafq_ref,
                         max_leaf=max_leaf, aux_ref=aux_ref,
                         intersector="watertight")
    ox = rays_ref[0]
    oy = rays_ref[1]
    oz = rays_ref[2]
    dx = rays_ref[3]
    dy = rays_ref[4]
    dz = rays_ref[5]
    mint = rays_ref[6]
    maxt = rays_ref[7]

    t, u, v, pid, hit_i, _m, nx, ny, nz = tracer(
        ox, oy, oz, dx, dy, dz, mint, maxt, want_aux=True)
    hit = hit_i != 0
    # miss lanes: normal 0 (aovs convention), occlusion rays dead
    nx = jnp.where(hit, nx, 0.0)
    ny = jnp.where(hit, ny, 0.0)
    nz = jnp.where(hit, nz, 0.0)

    # flip toward the incoming ray (render_ao: dot(n, dir) > 0 -> -n)
    flip = nx * dx + ny * dy + nz * dz > 0
    nx = jnp.where(flip, -nx, nx)
    ny = jnp.where(flip, -ny, ny)
    nz = jnp.where(flip, -nz, nz)

    # hit position (aovs_from_hits: org + t * dir) + epsilon offset
    eps = f32(1e-4)
    px = ox + t * dx + eps * nx
    py = oy + t * dy + eps * ny
    pz = oz + t * dz + eps * nz

    # Frisvad ONB, op-for-op objrender.build_onb
    s = jnp.where(nz >= 0.0, f32(1.0), f32(-1.0))
    a = -1.0 / (s + nz)
    b = nx * ny * a
    tx = 1.0 + s * nx * nx * a
    ty = s * b
    tz = -s * nx
    bx = b
    by = s + ny * ny * a
    bz = -ny
    far = jnp.where(hit, f32(ao_radius), f32(-1.0))
    zero = jnp.zeros_like(t)

    unocc = jnp.zeros(t.shape, jnp.int32)
    for k in range(S):
        l0 = rays_ref[8 + 3 * k]
        l1 = rays_ref[9 + 3 * k]
        l2 = rays_ref[10 + 3 * k]
        # world dir = l0*t + l1*b + l2*n (render_ao's basis combine)
        wx = l0 * tx + l1 * bx + l2 * nx
        wy = l0 * ty + l1 * by + l2 * ny
        wz = l0 * tz + l1 * bz + l2 * nz
        occ = tracer(px, py, pz, wx, wy, wz, zero, far,
                     occlusion=True, skip=pid)
        unocc = unocc + (1 - occ)

    frac = unocc.astype(f32) / f32(S)
    ao_ref[:] = jnp.where(hit, frac, 0.0)
    t_ref[:] = t
    u_ref[:] = u
    v_ref[:] = v
    p_ref[:] = pid
    h_ref[:] = hit_i


@functools.partial(jax.jit, static_argnames=(
    "n_samples", "max_leaf", "depth", "sub", "ao_radius", "interpret"))
def _ao_fused_impl(nodes, leafs, aux, rays_blk, n_samples, max_leaf,
                   depth, sub, ao_radius, interpret):
    NB = rays_blk.shape[1]
    kern = functools.partial(_ao_kernel, n_samples, max_leaf, sub,
                             ao_radius)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    nch = 8 + 3 * n_samples
    ray_spec = pl.BlockSpec((nch, None, sub, LANES),
                            lambda i: (0, i, 0, 0))
    out_spec = pl.BlockSpec((None, sub, LANES), lambda i: (i, 0, 0))
    out_shapes = (
        [jax.ShapeDtypeStruct((NB, sub, LANES), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((NB, sub, LANES), jnp.int32)] * 2)
    return pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[vmem, vmem, vmem, ray_spec],
        out_specs=tuple([out_spec] * 6),
        out_shape=tuple(out_shapes),
        scratch_shapes=fused_scratch_shapes(depth),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes, leafs, aux, rays_blk)


def build_ao_aux(mesh, s8):
    """Aux rows whose normals are bit-identical to
    objrender.face_normals (what render_ao shades with)."""
    from ..traverse.fused_trace import build_aux_rows
    from .objrender import face_normals

    F = int(mesh.num_faces)
    gn = np.asarray(
        face_normals(mesh, jnp.arange(F, dtype=jnp.uint32)), np.float32)
    return jnp.asarray(build_aux_rows(
        np.asarray(s8.leafs), np.zeros(F, np.int32),
        np.asarray(mesh.faces), np.asarray(mesh.vertices),
        s8.max_leaf, gn_unit=gn))


def render_ao_fused(mesh, rays, key, s8, aux, n_samples: int = 8,
                    ao_radius: float = 1e30, sub: int = 8,
                    stratified: bool = True, attrs=None, interpret=None):
    """One-kernel AO pass; returns the same (aovs, hits) contract as
    objrender.render_ao. ``s8`` is a width-16 BVH16Scene of ``mesh``;
    ``aux`` from build_ao_aux."""
    from .objrender import ao_hemisphere_draws, aovs_from_hits

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bs = rays.org.shape[:-1]
    org = jnp.asarray(rays.org, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(rays.dir, jnp.float32).reshape(-1, 3)
    R = org.shape[0]

    # the exact draws render_ao makes (shared generator — incl. the
    # azimuth stratification, so the two AO paths stay bit-identical)
    S = int(n_samples)
    d_local = ao_hemisphere_draws(
        key, S, bs if bs else (R,), jnp.float32, stratified
    ).reshape(S, R, 3)

    blk = sub * LANES
    NB = -(-R // blk)
    pad = NB * blk - R

    def prep(x, fill):
        x = jnp.pad(jnp.asarray(x, jnp.float32).reshape(-1), (0, pad),
                    constant_values=fill)
        return x.reshape(NB, sub, LANES)

    chans = [prep(org[:, 0], 0.0), prep(org[:, 1], 0.0),
             prep(org[:, 2], 0.0), prep(d[:, 0], 1.0),
             prep(d[:, 1], 0.0), prep(d[:, 2], 0.0),
             prep(rays.min_t, 1.0), prep(rays.max_t, 0.0)]
    for k in range(S):
        for c in range(3):
            chans.append(prep(d_local[k, :, c], 0.0))
    rays_blk = jnp.stack(chans, axis=0)

    outs = _ao_fused_impl(
        jnp.asarray(s8.nodes), jnp.asarray(s8.leafs), jnp.asarray(aux),
        rays_blk, S, int(s8.max_leaf), int(s8.depth), int(sub),
        float(ao_radius), bool(interpret))
    unshape = lambda x: x.reshape(-1)[:R].reshape(bs)
    ao, t, u, v = (unshape(o) for o in outs[:4])
    pid, hit_i = (unshape(o) for o in outs[4:])
    hit = hit_i != 0
    from ..core.options import INVALID_PRIM_ID

    hits = Hits(
        t=jnp.where(hit, t, rays.max_t.reshape(bs)),
        u=jnp.where(hit, u, 0.0),
        v=jnp.where(hit, v, 0.0),
        prim_id=jnp.where(hit, pid.astype(jnp.uint32),
                          jnp.uint32(INVALID_PRIM_ID)),
    )
    aovs = aovs_from_hits(mesh, attrs, rays, hits)
    aovs = {**aovs, "ao": ao, "rgb": ao[..., None].repeat(3, -1)}
    return aovs, hits

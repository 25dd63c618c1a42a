"""objrender: the reference's minimal renderer, plus ambient occlusion.

Reproduces examples/objrender/main.cc:581-709 as a jitted wavefront:
camera rays -> BVH traverse -> normal-shaded RGB + the GUI's AOV set
(normal/position/depth/texcoord/prim_id, gui/render-config.h:34-41 — the
de-facto observability surface per SURVEY.md §5). The per-scanline OpenMP
loop (objrender/main.cc:647-649) becomes a single whole-frame megabatch.

Also provides the ambient-occlusion pass (BASELINE.json config 1):
cosine-hemisphere occlusion rays with per-ray skip of the hit primitive.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import normalize
from ..core.options import BVHTraceOptions
from ..core.ray import Rays, make_rays
from ..ops.triangle import TriangleMesh
from ..traverse.stack import traverse_triangles


class MeshAttributes(NamedTuple):
    """Optional facevarying shading attributes, the reference example
    Mesh layout (objrender/main.cc Mesh: facevarying normals/uvs)."""

    normals: jnp.ndarray | None = None  # (F, 3, 3) facevarying
    uvs: jnp.ndarray | None = None  # (F, 3, 2) facevarying


def face_normals(mesh: TriangleMesh, fids: jnp.ndarray) -> jnp.ndarray:
    """Geometric normals for a batch of face ids."""
    f = jnp.take(mesh.faces, fids.astype(jnp.int32), axis=0)
    tri = jnp.take(mesh.vertices, f, axis=0)
    n = jnp.cross(tri[..., 1, :] - tri[..., 0, :], tri[..., 2, :] - tri[..., 0, :])
    return normalize(n)


def shading_normals(
    mesh: TriangleMesh, attrs: MeshAttributes | None, hits
) -> jnp.ndarray:
    """Interpolated vertex normals when available, else geometric
    (objrender/main.cc:662-676 equivalent)."""
    fids = hits.prim_id
    if attrs is None or attrs.normals is None:
        return face_normals(mesh, fids)
    n = jnp.take(attrs.normals, fids.astype(jnp.int32), axis=0)  # (..., 3, 3)
    w = (1.0 - hits.u - hits.v)[..., None]
    return normalize(
        w * n[..., 0, :] + hits.u[..., None] * n[..., 1, :] + hits.v[..., None] * n[..., 2, :]
    )


def _traverse_primary(bvh, mesh, rays, options, max_leaf, scene8,
                      specialize=None):
    """Primary-visibility traversal. Image-shaped batches go through the
    packet kernel in pixel tiles (each packet covers a compact frustum —
    the bench path); other shapes fall back to Morton-sorted packets."""
    if scene8 is None:
        return traverse_triangles(bvh, mesh, rays, options, max_leaf=max_leaf)
    bs = rays.batch_shape
    if len(bs) == 2:
        from ..traverse.pallas_packet import tile_image_rays, traverse_bvh8

        h, w = bs
        th = min(128, h)
        tw = min(64, w)
        if h % th == 0 and w % tw == 0:
            rays_t, untile = tile_image_rays(rays, th, tw)
            return untile(
                traverse_bvh8(rays=rays_t, scene=scene8, options=options,
                              specialize=specialize)
            )
    from ..traverse.ray_sort import traverse_bvh8_sorted

    return traverse_bvh8_sorted(scene8, rays, options)


@functools.partial(
    jax.jit, static_argnames=("options", "max_leaf", "specialize")
)
def render_aovs(
    bvh,
    mesh: TriangleMesh,
    rays: Rays,
    attrs: MeshAttributes | None = None,
    options: BVHTraceOptions = BVHTraceOptions(),
    max_leaf: int = 4,
    scene8=None,
    specialize=None,
):
    """One primary-visibility pass returning the AOV dict. Pass ``scene8``
    (a device-resident build.bvh8.BVH8Scene) to run traversals through
    the Pallas packet kernel — the TPU fast path. ``specialize`` forwards
    a (kz, shared_origin) claim to the packet kernel (see
    pallas_packet.detect_specialization); camera primaries from one
    pinhole qualify."""
    hits = _traverse_primary(
        bvh, mesh, rays, options, max_leaf, scene8, specialize
    )
    return aovs_from_hits(mesh, attrs, rays, hits), hits


def aovs_from_hits(mesh, attrs, rays, hits):
    """AOV dict from primary-hit records (the render_aovs assembly,
    shared with the fused AO kernel so both paths emit bit-identical
    AOVs for identical records)."""
    hit = hits.hit
    n = shading_normals(mesh, attrs, hits)
    # flip toward the ray like the normal-shading example output
    rgb = jnp.where(hit[..., None], 0.5 * n + 0.5, jnp.zeros_like(n))
    pos = rays.org + hits.t[..., None] * rays.dir
    return {
        "rgb": rgb,
        "normal": jnp.where(hit[..., None], n, 0.0),
        "position": jnp.where(hit[..., None], pos, 0.0),
        "depth": jnp.where(hit, hits.t, 0.0),
        "texcoord": jnp.stack([hits.u, hits.v], axis=-1),
        "prim_id": hits.prim_id,
        "hit": hit,
    }


def _cosine_hemisphere(key, shape, dtype, stratum=None, n_strata=1):
    """Cosine-weighted hemisphere directions around +z (the reference's
    revised-ONB sampler, path_tracer/main.cc:214-250). With ``stratum``,
    the azimuth is jittered inside wedge [stratum, stratum+1) * 2pi/n —
    same cosine density overall, lower variance."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, shape, dtype)
    u2 = jax.random.uniform(k2, shape, dtype)
    if stratum is not None:
        u2 = (jnp.asarray(stratum, dtype) + u2) / n_strata
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    return jnp.stack([x, y, z], axis=-1)


def ao_hemisphere_draws(key, n_samples, shape, dtype, stratified=True):
    """The AO recipe's per-sample local hemisphere directions,
    (n_samples,) + shape + (3,). Shared by render_ao and the fused AO
    kernel so the two always draw identically.

    ``stratified`` (default) assigns sample s the azimuth wedge
    [s, s+1) * 2pi/S — an equal-or-lower-variance estimator whose TPU
    reason is coherence: the sample-major occlusion megabatch becomes
    direction-presorted for free (a packet holds one wedge over pixels
    whose normals agree -> a tight world cone; measured 124 -> 93 ms on
    config A's occlusion phase, exp_r4_aostrat)."""
    S = n_samples
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(S))
    if stratified:
        return jax.vmap(
            lambda k, s: _cosine_hemisphere(k, shape, dtype, s, S)
        )(keys, jnp.arange(S))
    return jax.vmap(lambda k: _cosine_hemisphere(k, shape, dtype))(keys)


def build_onb(n: jnp.ndarray):
    """Branchless Frisvad-style orthonormal basis around n (..., 3)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt


def render_ao(
    bvh,
    mesh: TriangleMesh,
    rays: Rays,
    key,
    n_samples: int = 8,
    ao_radius: float = 1e30,
    options: BVHTraceOptions = BVHTraceOptions(),
    max_leaf: int = 4,
    scene8=None,
    specialize=None,
    stratified: bool = True,
    **trace_kw,
):
    """Ambient occlusion: fraction of unoccluded cosine-hemisphere
    samples from each primary hit point. Secondary rays skip the hit
    primitive instead of epsilon-offsetting alone (skip_prim_id,
    nanort.h:611-614). ``scene8`` routes all traversals through the
    packet kernel; ``trace_kw`` forwards engine knobs (e.g. ``sub=8``).

    All ``n_samples`` occlusion rays per pixel launch as ONE megabatch
    traversal (the reference's per-sample loop, objrender-style, is
    launch-overhead bound on TPU: 8 small dispatches cost ~20x the
    kernel time at 512^2). ``stratified`` (default) draws sample s's
    azimuth inside wedge s of the hemisphere — equal-or-lower variance,
    and the sample-major megabatch becomes direction-presorted so no
    sort pass is needed (exp_r4_aostrat: occlusion 124 -> 93 ms with
    the 32x32 pixel tiling applied below). Passing ``octant_major=True``
    selects the legacy sorted path instead."""
    # trace_kw values are engine config (bools/ints) — freeze them into
    # a hashable static arg so jit doesn't trace them
    return _render_ao_impl(
        bvh, mesh, rays, key, n_samples, ao_radius, options, max_leaf,
        scene8, specialize, stratified, tuple(sorted(trace_kw.items())),
    )


@functools.partial(
    jax.jit, static_argnames=("n_samples", "options", "max_leaf",
                              "specialize", "stratified", "trace_kw_items")
)
def _render_ao_impl(
    bvh,
    mesh: TriangleMesh,
    rays: Rays,
    key,
    n_samples: int = 8,
    ao_radius: float = 1e30,
    options: BVHTraceOptions = BVHTraceOptions(),
    max_leaf: int = 4,
    scene8=None,
    specialize=None,
    stratified: bool = True,
    trace_kw_items: tuple = (),
):
    trace_kw = dict(trace_kw_items)
    aovs, hits = render_aovs(
        bvh, mesh, rays, None, options, max_leaf, scene8, specialize
    )
    hit = hits.hit
    n = aovs["normal"]
    # face the normal toward the incoming ray
    n = jnp.where(
        jnp.sum(n * rays.dir, axis=-1, keepdims=True) > 0, -n, n
    )
    p = aovs["position"]
    t, bt = build_onb(n)
    dt = rays.dtype
    eps = jnp.asarray(1e-4, dt)

    S = n_samples
    d_local = ao_hemisphere_draws(key, S, hit.shape, dt, stratified)
    d = (
        d_local[..., 0:1] * t[None]
        + d_local[..., 1:2] * bt[None]
        + d_local[..., 2:3] * n[None]
    )
    org = jnp.broadcast_to((p + eps * n)[None], d.shape)
    # pixels whose primary ray missed launch DEAD occlusion rays
    # (max_t <= min_t): all-dead packets retire in one step
    far = jnp.broadcast_to(
        jnp.where(hit, jnp.asarray(ao_radius, dt), jnp.asarray(-1.0, dt))[None],
        d.shape[:-1],
    )
    skip = jnp.broadcast_to(hits.prim_id[None], (S,) + hit.shape)

    # 32x32 pixel tiling for the occlusion megabatch: packets then hold
    # one azimuth wedge over one compact pixel tile (tight origin box +
    # tight direction cone with the stratified draws). Static gather,
    # applied per sample, inverted after the occlusion sum.
    tile_pix = None
    if (
        scene8 is not None and len(hit.shape) == 2
        and hit.shape[0] % 32 == 0 and hit.shape[1] % 32 == 0
    ):
        H, W = hit.shape
        tp = np.arange(H * W).reshape(H // 32, 32, W // 32, 32)
        tile_pix = jnp.asarray(
            np.swapaxes(tp, 1, 2).reshape(-1), jnp.int32)

    def occ_layout(x):
        # (S,) + image dims (+ trailing comps) -> flat megabatch order
        flat = x.reshape((S, -1) + x.shape[1 + len(hit.shape):])
        if tile_pix is not None:
            flat = jnp.take(flat, tile_pix, axis=1)
        return flat.reshape((-1,) + flat.shape[2:])

    sec = make_rays(
        occ_layout(org), occ_layout(d), min_t=0.0, max_t=occ_layout(far)
    )
    if scene8 is not None:
        from ..traverse.pallas_packet import traverse_bvh8

        octant_major = trace_kw.pop("octant_major", False)
        if octant_major:
            from ..traverse.ray_sort import traverse_bvh8_sorted

            occ = traverse_bvh8_sorted(
                scene8, sec, options, skip_prim_id=occ_layout(skip),
                occlusion=True, octant_major=True, **trace_kw,
            )
        else:
            occ = traverse_bvh8(
                scene8, sec, options, skip_prim_id=occ_layout(skip),
                occlusion=True, **trace_kw,
            )
    else:
        occ = traverse_triangles(
            bvh, mesh, sec, options, skip_prim_id=occ_layout(skip),
            max_leaf=max_leaf,
        )
    unocc_flat = (~occ.hit).reshape(S, -1)
    open_tiled = jnp.sum(unocc_flat.astype(dt), axis=0) / S
    if tile_pix is not None:
        open_tiled = jnp.zeros_like(open_tiled).at[tile_pix].set(
            open_tiled)
    open_frac = open_tiled.reshape(hit.shape)
    ao = jnp.where(hit, open_frac, 0.0)
    return {**aovs, "ao": ao, "rgb": ao[..., None].repeat(3, -1)}, hits

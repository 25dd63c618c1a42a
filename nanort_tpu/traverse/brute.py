"""O(n) brute-force intersection — the test oracle.

Tests every ray against every primitive, scanning triangle chunks with
``lax.scan`` so memory stays bounded. Semantics replicate a sequential
scan of primitives 0..F-1 through the reference's ``Intersect`` contract
(``tt > t`` rejects, so among equal-t hits the *highest* prim index wins;
nanort.h:1131-1139). This is SURVEY.md step 2: the ground truth every
accelerated path is validated against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.options import BVHTraceOptions, INVALID_PRIM_ID
from ..core.ray import Hits, Rays
from ..ops import triangle as tri
from ..ops.protocol import apply_trace_filters


def _select_best(valid, tt, u, v, ids, t0, u0, v0, id0):
    """Reduce a (..., L) candidate axis into running-best per ray.

    min t wins; equal t resolves to the highest index in scan order
    (matching sequential replace-on-<= semantics). The incoming running
    best loses ties to the new chunk (later prims replace)."""
    big = jnp.array(jnp.finfo(tt.dtype).max, tt.dtype)
    t_m = jnp.where(valid, tt, big)
    t_best = jnp.min(t_m, axis=-1)
    # among equal-t valid lanes pick max position
    is_best = valid & (t_m == t_best[..., None])
    pos = jax.lax.broadcasted_iota(jnp.int32, tt.shape, tt.ndim - 1)
    best_pos = jnp.max(jnp.where(is_best, pos, -1), axis=-1)
    take = lambda a: jnp.take_along_axis(
        a, jnp.maximum(best_pos, 0)[..., None], axis=-1
    )[..., 0]
    any_hit = best_pos >= 0
    # replace-on-<=: new chunk wins ties against the carry
    upd = any_hit & (t_best <= t0)
    return (
        jnp.where(upd, t_best, t0),
        jnp.where(upd, take(u), u0),
        jnp.where(upd, take(v), v0),
        jnp.where(upd, take(ids), id0),
    )


@functools.partial(
    jax.jit, static_argnames=("options", "chunk_size", "skip_is_array")
)
def _brute_force_impl(
    mesh: tri.TriangleMesh,
    rays: Rays,
    skip_prim_id,
    options: BVHTraceOptions,
    chunk_size: int,
    skip_is_array: bool,
) -> Hits:
    n_faces = mesh.num_faces
    n_chunks = -(-n_faces // chunk_size)
    pad = n_chunks * chunk_size - n_faces
    faces = jnp.pad(mesh.faces, ((0, pad), (0, 0)))
    ctx = tri.triangle_prepare(mesh, rays)
    dt = rays.dtype
    bs = rays.batch_shape

    t0 = rays.max_t
    u0 = jnp.zeros(bs, dt)
    v0 = jnp.zeros(bs, dt)
    id0 = jnp.full(bs, INVALID_PRIM_ID, jnp.uint32)

    coeffs_l = jax.tree_util.tree_map(lambda x: x[..., None], ctx.coeffs)
    org_l = ctx.org[..., None, :]
    min_t_l = ctx.min_t[..., None]
    skip = skip_prim_id if skip_is_array else options.skip_prim_id

    def body(carry, chunk_idx):
        t_c, u_c, v_c, id_c = carry
        start = chunk_idx * chunk_size
        ids = (start + jnp.arange(chunk_size, dtype=jnp.int32)).astype(jnp.uint32)
        f = jax.lax.dynamic_slice(
            faces, (start, jnp.int32(0)), (chunk_size, 3)
        )
        p0, p1, p2 = tri.gather_triangle_vertices(mesh.vertices, f)
        valid, tt, u, v = tri.intersect_triangles(
            coeffs_l,
            org_l,
            min_t_l,
            t_c[..., None],
            p0,
            p1,
            p2,
            cull_back_face=options.cull_back_face,
            exact_edge_fallback=options.exact_edge_fallback,
        )
        valid = valid & (ids < n_faces)
        valid = apply_trace_filters(valid, ids, options.prim_ids_range, skip)
        ids_b = jnp.broadcast_to(ids, valid.shape)
        carry = _select_best(valid, tt, u, v, ids_b, t_c, u_c, v_c, id_c)
        return carry, None

    (t, u, v, pid), _ = jax.lax.scan(
        body, (t0, u0, v0, id0), jnp.arange(n_chunks, dtype=jnp.int32)
    )
    hit = t < rays.max_t
    return Hits(
        t=t,
        u=jnp.where(hit, u, 0.0),
        v=jnp.where(hit, v, 0.0),
        prim_id=jnp.where(hit, pid, jnp.uint32(INVALID_PRIM_ID)),
    )


def brute_force_traverse(
    mesh: tri.TriangleMesh,
    rays: Rays,
    options: BVHTraceOptions = BVHTraceOptions(),
    skip_prim_id=None,
    chunk_size: int = 512,
) -> Hits:
    """Intersect rays against all triangles (no BVH). Oracle for tests.

    ``skip_prim_id``: optional per-ray uint32 array overriding the static
    option (see apply_trace_filters).
    """
    skip_is_array = skip_prim_id is not None
    return _brute_force_impl(
        mesh,
        rays,
        skip_prim_id if skip_is_array else jnp.uint32(0),
        options,
        min(chunk_size, max(mesh.num_faces, 1)),
        skip_is_array,
    )

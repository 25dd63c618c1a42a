"""K-nearest multi-hit traversal — working, unlike the reference.

The reference declares ``MultiHitTraverse`` (nanort.h:761-770) with a
priority-queue K-nearest implementation, but ships it disabled behind
``#if 0`` (nanort.h:2409-2485, 2694-2797; README.md:269-271 "Fix
multi-hit ray traversal" TODO). This module provides the working
equivalent, TPU-style: per-ray sorted K-lists held in registers and
merged with vectorized sorts — no heap, no per-lane control flow.

Semantics:
* returns the K nearest hits per ray with t in [min_t, max_t], sorted
  ascending by t; empty slots carry t = +max and prim_id = 0xFFFFFFFF.
* traversal prunes with the ray's current K-th-best distance, so the
  node/leaf culling sharpens exactly as the single-hit engine's shrinking
  hit_t does (nanort.h:2545).
* trace-option filters (prim_ids_range, skip_prim_id, cull_back_face)
  apply per candidate, as in TestLeafNode (nanort.h:2372-2407).

Two engines, matching the single-hit pair:
* ``multi_hit_traverse``  — vmapped stack machine (any BVH, fp32/fp64);
* ``multi_hit_wavefront`` — stackless skip-link walk over a PackedScene
  (multi-mesh tables + per-ray roots supported).
Both are validated against ``brute_force_multi_hit``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.aabb import intersect_ray_aabb
from ..core.math import safe_inverse
from ..core.options import BVHTraceOptions, INVALID_PRIM_ID
from ..core.ray import Rays
from ..ops import triangle as tri
from ..ops.protocol import apply_trace_filters


class MultiHits(NamedTuple):
    """Per-ray K-nearest hit lists, ascending by t. Slot j is valid iff
    j < count (equivalently prim_id != 0xFFFFFFFF)."""

    t: jnp.ndarray  # (..., K)
    u: jnp.ndarray  # (..., K)
    v: jnp.ndarray  # (..., K)
    prim_id: jnp.ndarray  # (..., K) uint32
    count: jnp.ndarray  # (...,) int32

    @property
    def hit(self):
        return self.count > 0


def _merge_klists(t_l, u_l, v_l, id_l, valid_c, t_c, u_c, v_c, id_c):
    """Merge (R, K) sorted lists with (R, L) candidates -> (R, K) sorted.

    Sort key is (t, prim_id): deterministic output independent of the
    order candidates were discovered in, so the stack and wavefront
    engines produce identical lists even for equal-t ties."""
    dt = t_l.dtype
    big = jnp.array(jnp.finfo(dt).max, dt)
    K = t_l.shape[-1]
    t_all = jnp.concatenate([t_l, jnp.where(valid_c, t_c, big)], axis=-1)
    u_all = jnp.concatenate([u_l, u_c], axis=-1)
    v_all = jnp.concatenate([v_l, v_c], axis=-1)
    id_inv = jnp.uint32(INVALID_PRIM_ID)
    id_all = jnp.concatenate([id_l, jnp.where(valid_c, id_c, id_inv)], axis=-1)
    # composite key: t primary, prim_id secondary (stable ties)
    order = jnp.lexsort((id_all, t_all), axis=-1)[..., :K]
    take = lambda a: jnp.take_along_axis(a, order, axis=-1)
    return take(t_all), take(u_all), take(v_all), take(id_all)


def _empty_lists(shape, K, dt, like):
    big = jnp.array(jnp.finfo(dt).max, dt)
    zero = jnp.zeros(shape + (K,), dt) + like[..., None] * 0
    return (
        zero + big,
        zero,
        zero,
        zero.astype(jnp.uint32) + jnp.uint32(INVALID_PRIM_ID),
    )


# ---------------------------------------------------------------------------
# stack engine
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("options", "K", "max_leaf", "max_stack", "skip_is_array"),
)
def _multi_hit_stack_impl(
    bvh, mesh, rays, skip_prim_id, options, K, max_leaf, max_stack,
    skip_is_array,
):
    bs = rays.batch_shape
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[len(bs):]), rays
    )
    skip = skip_prim_id.reshape(-1) if skip_is_array else options.skip_prim_id
    dt = flat.dtype
    R = flat.org.shape[0]

    bmin = jnp.asarray(bvh.bmin, dt)
    bmax = jnp.asarray(bvh.bmax, dt)
    flag = jnp.asarray(bvh.flag, jnp.int32)
    axis = jnp.asarray(bvh.axis, jnp.int32)
    data = jnp.asarray(bvh.data).astype(jnp.int32)
    indices = jnp.asarray(bvh.indices).astype(jnp.int32)

    ctx = tri.triangle_prepare(mesh, flat)
    intersect_fn = tri.make_triangle_intersect(
        cull_back_face=options.cull_back_face,
        exact_edge_fallback=options.exact_edge_fallback,
    )

    dir_neg = flat.dir < 0
    inv_dir = safe_inverse(flat.dir)

    zero = jnp.zeros_like(flat.max_t)
    stack = jnp.zeros((R, max_stack), jnp.int32) + zero.astype(jnp.int32)[:, None]
    sp0 = zero.astype(jnp.int32)
    t_l0, u_l0, v_l0, id_l0 = _empty_lists((R,), K, dt, zero)
    lpos = jnp.arange(max_leaf, dtype=jnp.int32)
    big = jnp.array(jnp.finfo(dt).max, dt)

    def kth(t_l):
        # prune with K-th best, but never beyond the ray's max_t window
        return jnp.minimum(t_l[:, K - 1], flat.max_t)

    def cond(state):
        return jnp.any(state[0] >= 0)

    def body(state):
        sp, stk, t_l, u_l, v_l, id_l = state
        active = sp >= 0
        slot = jnp.maximum(sp, 0)
        idx = jnp.take_along_axis(stk, slot[:, None], axis=1)[:, 0]
        sp = jnp.where(active, sp - 1, sp)

        nb_lo = jnp.take(bmin, idx, axis=0)
        nb_hi = jnp.take(bmax, idx, axis=0)
        nflag = jnp.take(flag, idx, axis=0)
        naxis = jnp.take(axis, idx, axis=0)
        nd = jnp.take(data, idx, axis=0)

        t_cap = kth(t_l)
        box_hit, _, _ = intersect_ray_aabb(
            nb_lo, nb_hi, flat.org, inv_dir, dir_neg, flat.min_t, t_cap
        )
        box_hit = box_hit & active
        is_leaf = nflag == 1

        near_sel = jnp.take_along_axis(dir_neg, naxis[:, None], axis=1)[:, 0]
        near = jnp.where(near_sel, nd[:, 1], nd[:, 0])
        far = jnp.where(near_sel, nd[:, 0], nd[:, 1])
        push = box_hit & ~is_leaf & (sp + 2 <= max_stack - 1)
        s1 = jnp.minimum(sp + 1, max_stack - 1)
        s2 = jnp.minimum(sp + 2, max_stack - 1)
        rr = jnp.arange(R)
        stk = stk.at[rr, s1].set(jnp.where(push, far, stk[rr, s1]))
        stk = stk.at[rr, s2].set(jnp.where(push, near, stk[rr, s2]))
        sp = jnp.where(push, sp + 2, sp)

        do_leaf = box_hit & is_leaf
        count = nd[:, 0]
        offset = nd[:, 1]
        lidx = offset[:, None] + lpos[None, :]
        lval = (lpos[None, :] < count[:, None]) & do_leaf[:, None]
        lidx = jnp.where(lval, lidx, 0)
        pids = jnp.take(indices, lidx, axis=0).astype(jnp.uint32)
        valid, tt, uu, vv = intersect_fn(mesh, ctx, pids, t_cap)
        valid = valid & lval
        valid = apply_trace_filters(valid, pids, options.prim_ids_range, skip)

        t_l, u_l, v_l, id_l = _merge_klists(
            t_l, u_l, v_l, id_l, valid, tt, uu, vv, pids
        )
        return sp, stk, t_l, u_l, v_l, id_l

    _, _, t_l, u_l, v_l, id_l = jax.lax.while_loop(
        cond, body, (sp0, stack, t_l0, u_l0, v_l0, id_l0)
    )
    valid = id_l != jnp.uint32(INVALID_PRIM_ID)
    out = MultiHits(
        t=jnp.where(valid, t_l, big),
        u=jnp.where(valid, u_l, 0.0),
        v=jnp.where(valid, v_l, 0.0),
        prim_id=id_l,
        count=jnp.sum(valid.astype(jnp.int32), axis=-1),
    )
    rs = lambda x: x.reshape(bs + x.shape[1:])
    return jax.tree_util.tree_map(rs, out)


def multi_hit_traverse(
    bvh,
    mesh: tri.TriangleMesh,
    rays: Rays,
    max_intersections: int = 8,
    options: BVHTraceOptions = BVHTraceOptions(),
    skip_prim_id=None,
    max_leaf: int = 4,
    max_stack: int | None = None,
) -> MultiHits:
    """K-nearest triangle hits via the vmapped stack engine
    (reference MultiHitTraverse contract, nanort.h:2694-2797, repaired)."""
    from .stack import _auto_max_stack

    if max_stack is None:
        max_stack = _auto_max_stack(bvh)
    skip_is_array = skip_prim_id is not None
    return _multi_hit_stack_impl(
        bvh,
        mesh,
        rays,
        skip_prim_id if skip_is_array else jnp.uint32(0),
        options,
        max_intersections,
        max_leaf,
        max_stack,
        skip_is_array,
    )


# ---------------------------------------------------------------------------
# wavefront engine
# ---------------------------------------------------------------------------


def _bitcast_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("n_nodes", "options", "K", "max_leaf", "tile", "has_root"),
)
def _multi_hit_wavefront_impl(
    nodes, soup, n_nodes, rays, options, K, max_leaf, tile, has_root,
    root=None,
):
    from .wavefront import _slab_soa

    bs = rays.batch_shape
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[len(bs):]), rays
    )
    R = flat.org.shape[0]
    n_tiles = -(-R // tile)
    pad = n_tiles * tile - R

    def pad_to(x, fill=0.0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    org = pad_to(flat.org)
    dirs = pad_to(flat.dir, 1.0)
    min_t = pad_to(flat.min_t, 1.0)
    max_t = pad_to(flat.max_t, 0.0)
    root_f = pad_to(root.reshape(-1).astype(jnp.int32)) if has_root else None
    coeffs = tri.ray_coeffs(dirs)
    n = jnp.int32(n_nodes)
    lpos = jnp.arange(max_leaf, dtype=jnp.int32)

    def tile_fn(args):
        o, d, mn, mx, cf = args[:5]
        rt = args[5] if has_root else None
        dt = o.dtype
        T = o.shape[0]
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        inv = safe_inverse(d)
        ix, iy, iz = inv[:, 0], inv[:, 1], inv[:, 2]
        nx, ny, nz = d[:, 0] < 0, d[:, 1] < 0, d[:, 2] < 0
        big = jnp.array(jnp.finfo(dt).max, dt)

        start = jnp.zeros_like(mn, jnp.int32) if rt is None else rt
        cur0 = jnp.where(mx < mn, n, start)
        t_l0, u_l0, v_l0, id_l0 = _empty_lists((T,), K, dt, mx)

        def kth(t_l):
            return jnp.minimum(t_l[:, K - 1], mx)

        def inner_cond(c):
            return c[0]

        def inner_body(c):
            _, cur, lcnt, loff, lskp, t_cap = c
            safe = jnp.minimum(cur, n - 1)
            row = jnp.take(nodes, safe, axis=0)
            active = cur < n
            hit = _slab_soa(row, ox, oy, oz, ix, iy, iz, nx, ny, nz, mn, t_cap)
            hit = hit & active
            cnt = _bitcast_i32(row[:, 6])
            off = _bitcast_i32(row[:, 7])
            skp = _bitcast_i32(row[:, 8])
            leaf_hit = hit & (cnt > 0)
            nxt = jnp.where(hit, cur + 1, skp)
            advance = active & ~leaf_hit
            cur = jnp.where(advance, nxt, cur)
            lcnt = jnp.where(leaf_hit, cnt, 0)
            loff = jnp.where(leaf_hit, off, 0)
            lskp = jnp.where(leaf_hit, skp, lskp)
            pending = jnp.any(advance & (cur < n))
            return pending, cur, lcnt, loff, lskp, t_cap

        def outer_cond(s):
            return jnp.any(s[0] < n)

        def outer_body(s):
            cur, t_l, u_l, v_l, id_l = s
            t_cap = kth(t_l)
            _, cur, lcnt, loff, lskp, _ = jax.lax.while_loop(
                inner_cond,
                inner_body,
                (jnp.any(cur < n), cur, cur * 0, cur * 0, cur, t_cap),
            )
            has = lcnt > 0
            rows_idx = jnp.clip(
                loff[:, None] + lpos[None, :], 0, soup.shape[0] - 1
            )
            rows = jnp.take(soup, rows_idx, axis=0)
            p0 = rows[..., 0:3]
            p1 = rows[..., 3:6]
            p2 = rows[..., 6:9]
            pids = _bitcast_i32(rows[..., 9]).astype(jnp.uint32)
            coeffs_l = jax.tree_util.tree_map(lambda x: x[:, None], cf)
            t_cap2 = kth(t_l)
            valid, tt, uu, vv = tri.intersect_triangles(
                coeffs_l,
                o[:, None, :],
                mn[:, None],
                t_cap2[:, None],
                p0,
                p1,
                p2,
                cull_back_face=options.cull_back_face,
                exact_edge_fallback=options.exact_edge_fallback,
            )
            valid = valid & (lpos[None, :] < lcnt[:, None]) & has[:, None]
            valid = apply_trace_filters(
                valid, pids, options.prim_ids_range, options.skip_prim_id
            )
            t_l, u_l, v_l, id_l = _merge_klists(
                t_l, u_l, v_l, id_l, valid, tt, uu, vv, pids
            )
            cur = jnp.where(has, lskp, cur)
            return cur, t_l, u_l, v_l, id_l

        _, t_l, u_l, v_l, id_l = jax.lax.while_loop(
            outer_cond, outer_body, (cur0, t_l0, u_l0, v_l0, id_l0)
        )
        valid = id_l != jnp.uint32(INVALID_PRIM_ID)
        return MultiHits(
            t=jnp.where(valid, t_l, big),
            u=jnp.where(valid, u_l, 0.0),
            v=jnp.where(valid, v_l, 0.0),
            prim_id=id_l,
            count=jnp.sum(valid.astype(jnp.int32), axis=-1),
        )

    reshape = lambda x: x.reshape((n_tiles, tile) + x.shape[1:])
    args = [reshape(org), reshape(dirs), reshape(min_t), reshape(max_t),
            jax.tree_util.tree_map(reshape, coeffs)]
    if has_root:
        args.append(reshape(root_f))
    hits = jax.lax.map(tile_fn, tuple(args))
    unpad = lambda x: x.reshape((n_tiles * tile,) + x.shape[2:])[:R]
    hits = jax.tree_util.tree_map(unpad, hits)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(bs + x.shape[1:]), hits
    )


def multi_hit_wavefront(
    scene,
    rays: Rays,
    max_intersections: int = 8,
    options: BVHTraceOptions = BVHTraceOptions(),
    max_leaf: int = 4,
    tile: int = 8192,
    root=None,
) -> MultiHits:
    """K-nearest hits via the stackless skip-link engine over a
    PackedScene (supports multi-mesh tables with per-ray ``root``)."""
    nodes = jnp.asarray(scene.nodes)
    soup = jnp.asarray(scene.soup)
    return _multi_hit_wavefront_impl(
        nodes,
        soup,
        scene.num_nodes,
        rays,
        options,
        max_intersections,
        max_leaf,
        tile,
        root is not None,
        root=root,
    )


# ---------------------------------------------------------------------------
# oracle
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("options", "K", "chunk_size")
)
def _brute_multi_impl(mesh, rays, options, K, chunk_size):
    bs = rays.batch_shape
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[len(bs):]), rays
    )
    dt = flat.dtype
    R = flat.org.shape[0]
    n_faces = mesh.num_faces
    n_chunks = -(-n_faces // chunk_size)
    padf = n_chunks * chunk_size - n_faces
    faces = jnp.pad(mesh.faces, ((0, padf), (0, 0)))
    ctx = tri.triangle_prepare(mesh, flat)
    big = jnp.array(jnp.finfo(dt).max, dt)

    coeffs_l = jax.tree_util.tree_map(lambda x: x[..., None], ctx.coeffs)
    org_l = ctx.org[..., None, :]
    min_t_l = ctx.min_t[..., None]
    zero = jnp.zeros_like(flat.max_t)
    lists = _empty_lists((R,), K, dt, zero)

    def body(carry, chunk_idx):
        t_l, u_l, v_l, id_l = carry
        start = chunk_idx * chunk_size
        ids = (start + jnp.arange(chunk_size, dtype=jnp.int32)).astype(
            jnp.uint32
        )
        f = jax.lax.dynamic_slice(faces, (start, jnp.int32(0)), (chunk_size, 3))
        p0, p1, p2 = tri.gather_triangle_vertices(mesh.vertices, f)
        t_cap = jnp.minimum(t_l[:, K - 1], flat.max_t)
        valid, tt, uu, vv = tri.intersect_triangles(
            coeffs_l,
            org_l,
            min_t_l,
            t_cap[..., None],
            p0,
            p1,
            p2,
            cull_back_face=options.cull_back_face,
            exact_edge_fallback=options.exact_edge_fallback,
        )
        valid = valid & (ids < n_faces)
        valid = apply_trace_filters(
            valid, ids, options.prim_ids_range, options.skip_prim_id
        )
        ids_b = jnp.broadcast_to(ids, valid.shape)
        return (
            _merge_klists(t_l, u_l, v_l, id_l, valid, tt, uu, vv, ids_b),
            None,
        )

    (t_l, u_l, v_l, id_l), _ = jax.lax.scan(
        body, lists, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    valid = id_l != jnp.uint32(INVALID_PRIM_ID)
    out = MultiHits(
        t=jnp.where(valid, t_l, big),
        u=jnp.where(valid, u_l, 0.0),
        v=jnp.where(valid, v_l, 0.0),
        prim_id=id_l,
        count=jnp.sum(valid.astype(jnp.int32), axis=-1),
    )
    rs = lambda x: x.reshape(bs + x.shape[1:])
    return jax.tree_util.tree_map(rs, out)


def brute_force_multi_hit(
    mesh: tri.TriangleMesh,
    rays: Rays,
    max_intersections: int = 8,
    options: BVHTraceOptions = BVHTraceOptions(),
    chunk_size: int = 512,
) -> MultiHits:
    """O(n) K-nearest oracle for multi-hit tests."""
    return _brute_multi_impl(
        mesh,
        rays,
        options,
        max_intersections,
        min(chunk_size, max(mesh.num_faces, 1)),
    )

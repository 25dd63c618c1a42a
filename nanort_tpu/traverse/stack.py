"""Vmapped stack-based BVH traversal (pure JAX).

The reference traverses one ray with an iterative depth-first loop over a
512-entry node stack, visiting the near child first by per-axis direction
sign (``BVHAccel::Traverse``, nanort.h:2487-2556). Here the same loop is a
``lax.while_loop`` over *per-ray* register state, ``vmap``-ed over a ray
megabatch: every iteration processes one stack entry per ray in lockstep,
with masking for rays whose work differs. Node fetches become batched
gathers; leaf tests evaluate a statically-sized window of
``max_leaf_primitives`` primitives with masking.

This is the v0 device traversal (SURVEY.md step 4) and the correctness
anchor for the Pallas wavefront kernel: identical hit records, including
the reference's tie-breaking (equal-t replaces, so the last equal-t hit in
traversal order wins — nanort.h:1131-1139 via TestLeafNode, 2372-2407).

Stack depth: the reference allots 512 words/ray (nanort.h:63,2497).
Here ``max_stack=None`` (the default) sizes the stack from the built
tree's measured depth (core.bvh.required_max_stack), so overflow cannot
silently corrupt results; an explicit ``max_stack`` is honored for jitted
callers whose BVH arrays are traced.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.aabb import intersect_ray_aabb
from ..core.math import safe_inverse
from ..core.options import BVHTraceOptions, INVALID_PRIM_ID
from ..core.ray import Hits, Rays
from ..ops import triangle as tri
from ..ops.protocol import apply_trace_filters


def _traverse_batch(
    bvh,
    prims,
    rays: Rays,
    ctx,
    skip,
    options: BVHTraceOptions,
    intersect_fn: Callable,
    max_leaf: int,
    max_stack: int,
) -> Hits:
    """Lockstep traversal of a flat ray batch (rays fields are (R, ...))."""
    dt = rays.dtype
    R = rays.org.shape[0]

    bmin = jnp.asarray(bvh.bmin, dt)
    bmax = jnp.asarray(bvh.bmax, dt)
    flag = jnp.asarray(bvh.flag, jnp.int32)
    axis = jnp.asarray(bvh.axis, jnp.int32)
    data = jnp.asarray(bvh.data).astype(jnp.int32)
    indices = jnp.asarray(bvh.indices).astype(jnp.int32)

    dir_neg = rays.dir < 0  # (R, 3) (nanort.h:2506-2509)
    inv_dir = safe_inverse(rays.dir)

    # derive all carries from ray data so they are "varying" over any
    # shard_map mesh axis (constants would be replicated and trip the
    # while_loop vma check under jax.shard_map)
    zero = jnp.zeros_like(rays.max_t)
    stack = jnp.zeros((R, max_stack), jnp.int32) + zero.astype(jnp.int32)[:, None]
    sp0 = zero.astype(jnp.int32)  # root pre-seeded at stack slot 0
    t0 = rays.max_t
    u0 = zero
    v0 = zero
    id0 = zero.astype(jnp.uint32) + jnp.uint32(INVALID_PRIM_ID)
    lpos = jnp.arange(max_leaf, dtype=jnp.int32)

    def cond(state):
        sp = state[0]
        return jnp.any(sp >= 0)

    def body(state):
        sp, stk, t, u, v, pid = state
        active = sp >= 0
        slot = jnp.maximum(sp, 0)
        idx = jnp.take_along_axis(stk, slot[:, None], axis=1)[:, 0]
        sp = jnp.where(active, sp - 1, sp)

        nb_lo = jnp.take(bmin, idx, axis=0)
        nb_hi = jnp.take(bmax, idx, axis=0)
        nflag = jnp.take(flag, idx, axis=0)
        naxis = jnp.take(axis, idx, axis=0)
        nd = jnp.take(data, idx, axis=0)  # (R, 2)

        box_hit, _, _ = intersect_ray_aabb(
            nb_lo, nb_hi, rays.org, inv_dir, dir_neg, rays.min_t, t
        )
        box_hit = box_hit & active
        is_leaf = nflag == 1

        # --- branch: push far then near (near popped first) ---
        near_sel = jnp.take_along_axis(dir_neg, naxis[:, None], axis=1)[:, 0]
        near = jnp.where(near_sel, nd[:, 1], nd[:, 0])
        far = jnp.where(near_sel, nd[:, 0], nd[:, 1])
        # refuse pushes that don't fit: the subtree is dropped rather
        # than corrupting slots / growing sp unboundedly. Unreachable
        # with the auto-sized stack (required_max_stack); a too-small
        # explicit max_stack degrades to missed subtrees, never a hang.
        push = box_hit & ~is_leaf & (sp + 2 <= max_stack - 1)
        s1 = jnp.minimum(sp + 1, max_stack - 1)
        s2 = jnp.minimum(sp + 2, max_stack - 1)
        rr = jnp.arange(R)
        stk_pushed = stk.at[rr, s1].set(jnp.where(push, far, stk[rr, s1]))
        stk_pushed = stk_pushed.at[rr, s2].set(
            jnp.where(push, near, stk_pushed[rr, s2])
        )
        stk = stk_pushed
        sp = jnp.where(push, sp + 2, sp)

        # --- leaf: masked fixed-window primitive test ---
        do_leaf = box_hit & is_leaf
        count = nd[:, 0]
        offset = nd[:, 1]
        lidx = offset[:, None] + lpos[None, :]  # (R, L)
        lval = (lpos[None, :] < count[:, None]) & do_leaf[:, None]
        lidx = jnp.where(lval, lidx, 0)
        pids = jnp.take(indices, lidx, axis=0).astype(jnp.uint32)
        valid, tt, uu, vv = intersect_fn(prims, ctx, pids, t)
        valid = valid & lval
        valid = apply_trace_filters(valid, pids, options.prim_ids_range, skip)

        # replace-on-<= with last-equal-wins inside the leaf window
        big = jnp.array(jnp.finfo(dt).max, dt)
        t_m = jnp.where(valid, tt, big)
        t_best = jnp.min(t_m, axis=-1)
        is_best = valid & (t_m == t_best[:, None])
        best_pos = jnp.max(jnp.where(is_best, lpos[None, :], -1), axis=-1)
        got = best_pos >= 0
        sel = jnp.maximum(best_pos, 0)[:, None]
        take1 = lambda a: jnp.take_along_axis(a, sel, axis=1)[:, 0]
        upd = got & (t_best <= t)
        t = jnp.where(upd, t_best, t)
        u = jnp.where(upd, take1(uu), u)
        v = jnp.where(upd, take1(vv), v)
        pid = jnp.where(upd, take1(pids), pid)
        return sp, stk, t, u, v, pid

    _, _, t, u, v, pid = jax.lax.while_loop(
        cond, body, (sp0, stack, t0, u0, v0, id0)
    )
    hit = t < rays.max_t  # nanort.h:2552
    return Hits(
        t=t,
        u=jnp.where(hit, u, jnp.zeros((), dt)),
        v=jnp.where(hit, v, jnp.zeros((), dt)),
        prim_id=jnp.where(hit, pid, jnp.uint32(INVALID_PRIM_ID)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "options",
        "prepare_fn",
        "intersect_fn",
        "max_leaf",
        "max_stack",
        "skip_is_array",
    ),
)
def _traverse_jit(
    bvh,
    prims,
    rays,
    skip_prim_id,
    options,
    prepare_fn,
    intersect_fn,
    max_leaf,
    max_stack,
    skip_is_array,
):
    bs = rays.batch_shape
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[len(bs):]), rays
    )
    skip = skip_prim_id.reshape(-1) if skip_is_array else options.skip_prim_id
    ctx = prepare_fn(prims, flat)
    hits = _traverse_batch(
        bvh, prims, flat, ctx, skip, options, intersect_fn, max_leaf, max_stack
    )
    return jax.tree_util.tree_map(lambda x: x.reshape(bs), hits)


# memo: id(flag array) -> safe stack size (tiny LRU-ish cap)
_STACK_SIZE_MEMO: dict = {}


def _auto_max_stack(bvh) -> int:
    """Stack slots sized from the actual tree depth (never overflows).

    Falls back to the reference's 512 (nanort.h:63) when the BVH arrays
    are traced values whose depth can't be inspected host-side.

    The memo entry pins the flag array it is keyed on: ``id()`` values
    are recycled after garbage collection, so a bare id key can hand a
    fresh (deeper) tree another tree's stack size — silent corruption."""
    from ..core.bvh import required_max_stack

    key = id(bvh.flag)
    hit = _STACK_SIZE_MEMO.get(key)
    if hit is not None and hit[0] is bvh.flag:
        return hit[1]
    try:
        need = required_max_stack(bvh)
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        return 512  # traced arrays inside jit/shard_map
    if len(_STACK_SIZE_MEMO) > 16:
        _STACK_SIZE_MEMO.clear()
    _STACK_SIZE_MEMO[key] = (bvh.flag, need)
    return need


_LEAF_COUNT_MEMO: dict = {}


def _actual_max_leaf(bvh) -> int | None:
    """Largest primitive count in any leaf of this tree (None when the
    arrays are traced and can't be inspected host-side). Memoized with
    the same object-pinning scheme as the stack-size memo."""
    key = id(bvh.flag)
    hit = _LEAF_COUNT_MEMO.get(key)
    if hit is not None and hit[0] is bvh.flag:
        return hit[1]
    try:
        flag = np.asarray(bvh.flag)
        data = np.asarray(bvh.data)
        leaf = flag == 1
        need = int(data[leaf, 0].max()) if leaf.any() else 0
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        return None  # traced arrays inside jit/shard_map
    if len(_LEAF_COUNT_MEMO) > 16:
        _LEAF_COUNT_MEMO.clear()
    _LEAF_COUNT_MEMO[key] = (bvh.flag, need)
    return need


def traverse(
    bvh,
    prims,
    rays: Rays,
    options: BVHTraceOptions = BVHTraceOptions(),
    *,
    prepare_fn: Callable,
    intersect_fn: Callable,
    max_leaf: int,
    skip_prim_id=None,
    max_stack: int | None = None,
) -> Hits:
    """Generic BVH traversal for any primitive kind (see ops.protocol).

    ``max_stack=None`` (default) sizes the per-ray stack from the built
    tree's depth so overflow cannot silently corrupt results (ADVICE r1).
    ``max_leaf`` may be None to size the leaf unroll from the tree; an
    explicit value smaller than the tree's largest leaf raises (the old
    behavior silently skipped primitives past the unroll bound — wrong
    hits with no error)."""
    if max_stack is None:
        max_stack = _auto_max_stack(bvh)
    actual = _actual_max_leaf(bvh)
    if max_leaf is None:
        if actual is None:
            raise ValueError(
                "max_leaf=None needs a host-inspectable BVH (inside "
                "jit/shard_map pass the build's max_leaf_primitives "
                "explicitly)"
            )
        max_leaf = max(actual, 1)
    elif actual is not None and actual > max_leaf:
        raise ValueError(
            f"BVH has leaves holding {actual} primitives but max_leaf="
            f"{max_leaf}; primitives past the unroll bound would be "
            f"silently skipped — pass max_leaf>={actual} (or None)"
        )
    skip_is_array = skip_prim_id is not None
    return _traverse_jit(
        bvh,
        prims,
        rays,
        skip_prim_id if skip_is_array else jnp.uint32(0),
        options,
        prepare_fn,
        intersect_fn,
        max_leaf,
        max_stack,
        skip_is_array,
    )


def traverse_triangles(
    bvh,
    mesh: tri.TriangleMesh,
    rays: Rays,
    options: BVHTraceOptions = BVHTraceOptions(),
    skip_prim_id=None,
    max_leaf: int = 4,
    max_stack: int | None = None,
) -> Hits:
    """Triangle-mesh traversal (reference BVHAccel<float>::Traverse +
    TriangleIntersector)."""
    intersect_fn = tri.make_triangle_intersect(
        cull_back_face=options.cull_back_face,
        exact_edge_fallback=options.exact_edge_fallback,
    )
    return traverse(
        bvh,
        mesh,
        rays,
        options,
        prepare_fn=tri.triangle_prepare,
        intersect_fn=intersect_fn,
        max_leaf=max_leaf,
        skip_prim_id=skip_prim_id,
        max_stack=max_stack,
    )


def list_node_intersections(
    bvh,
    rays: Rays,
    max_intersections: int = 64,
):
    """Collect up to K nearest leaf-node AABB intersections per ray,
    sorted front-to-back (reference ``BVHAccel::ListNodeIntersections``,
    nanort.h:2558-2692 — the two-level traversal's top-level query,
    nanosg.h:792).

    Returns (t_min, t_max, node_id) arrays of shape (..., K); empty slots
    carry node_id == 0xFFFFFFFF and t_min = +max. The reference walks the
    tree with a priority queue; on TPU the leaf count of a top-level BVH
    (one leaf per instance, min_leaf_primitives=1, nanosg.h:731) is tiny,
    so all leaf boxes are tested in one vectorized pass and top-K sorted.
    """
    import numpy as np

    from ..core.aabb import intersect_ray_aabb

    flag = np.asarray(bvh.flag)
    leaf_ids = np.nonzero(flag == 1)[0].astype(np.int32)
    lo = jnp.asarray(np.asarray(bvh.bmin)[leaf_ids])
    hi = jnp.asarray(np.asarray(bvh.bmax)[leaf_ids])
    leaf_ids = jnp.asarray(leaf_ids)

    bs = rays.batch_shape
    org = rays.org.reshape(-1, 3)
    d = rays.dir.reshape(-1, 3)
    min_t = rays.min_t.reshape(-1)
    max_t = rays.max_t.reshape(-1)
    inv = safe_inverse(d)
    hit, tmin, tmax = intersect_ray_aabb(
        lo[None], hi[None], org[:, None], inv[:, None],
        (d < 0)[:, None], min_t[:, None], max_t[:, None],
    )  # (R, L)
    dt = org.dtype
    big = jnp.array(jnp.finfo(dt).max, dt)
    K = min(max_intersections, lo.shape[0])
    key = jnp.where(hit, tmin, big)
    order = jnp.argsort(key, axis=1)[:, :K]
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    t_min_k = take(key)
    t_max_k = jnp.where(take(hit), take(tmax), big)
    ids_k = jnp.where(
        take(hit),
        jnp.take(leaf_ids, order).astype(jnp.uint32),
        jnp.uint32(INVALID_PRIM_ID),
    )
    rs = lambda a: a.reshape(bs + (K,))
    return rs(t_min_k), rs(t_max_k), rs(ids_k)

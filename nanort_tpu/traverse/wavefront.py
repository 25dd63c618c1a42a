"""Wavefront skip-link traversal — the TPU hot path.

Replaces the reference's per-ray recursive stack machine (nanort.h:
2487-2556) with a stackless DFS-preorder walk driven entirely by batched
row gathers and VPU-wide masked arithmetic:

* per ray the only traversal state is a single preorder cursor ``cur``;
  a hit branch advances to ``cur + 1`` (its left child in preorder), a
  miss jumps to the precomputed escape index ``skip[cur]`` — no per-ray
  stack, hence no scatter into (R, depth) stack arrays (which measure
  ~1000x slower than gathers on TPU).
* "while-while" phase split (Aila/Laine-style): an inner loop advances
  every ray through *node* steps (one 48-byte row gather + slab test per
  step) until each active ray parks at a hit leaf; the outer step then
  runs one vectorized leaf test (``max_leaf`` soup-row gathers + watertight
  Moller-Trumbore over the whole tile). Rays testing leaves don't stall
  rays still descending, and leaf gathers are only paid on leaf steps.
* rays are processed in fixed-size tiles via ``lax.map`` so a tile of
  early-finishing rays retires without waiting for the whole megabatch
  (lockstep cost is per-tile max steps, not global max).

Differences vs the reference, by design:
* traversal order is fixed DFS preorder, not per-ray near-child-first;
  t-pruning via the shrinking hit distance still culls, and hit records
  are identical except which of several *exactly equal-t* primitives wins
  (the reference itself leaves that to traversal order).
* fp32 only (the fp64 path uses traverse.stack).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.options import BVHTraceOptions, INVALID_PRIM_ID
from ..core.ray import Hits, Rays
from ..ops import triangle as tri
from ..ops.protocol import apply_trace_filters
from .packed import PackedScene, pack_scene  # noqa: F401  (re-export)


def _bitcast_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _slab_soa(row, ox, oy, oz, ix, iy, iz, nx, ny, nz, min_t, t_best):
    """Robust slab test on a gathered node-row tile (reference
    IntersectRayAABB, nanort.h:2284-2325). n* are per-axis dir<0 masks."""
    dt = ox.dtype
    mm = jnp.array(1.00000024, dt)
    b0x, b0y, b0z = row[:, 0], row[:, 1], row[:, 2]
    b1x, b1y, b1z = row[:, 3], row[:, 4], row[:, 5]
    lox = jnp.where(nx, b1x, b0x)
    hix = jnp.where(nx, b0x, b1x)
    loy = jnp.where(ny, b1y, b0y)
    hiy = jnp.where(ny, b0y, b1y)
    loz = jnp.where(nz, b1z, b0z)
    hiz = jnp.where(nz, b0z, b1z)
    t0x = (lox - ox) * ix
    t0y = (loy - oy) * iy
    t0z = (loz - oz) * iz
    t1x = (hix - ox) * ix * mm
    t1y = (hiy - oy) * iy * mm
    t1z = (hiz - oz) * iz * mm
    # NaN-filtered folds: (x > acc) keeps acc when x is NaN
    tmin = min_t
    tmin = jnp.where(t0x > tmin, t0x, tmin)
    tmin = jnp.where(t0y > tmin, t0y, tmin)
    tmin = jnp.where(t0z > tmin, t0z, tmin)
    tmax = t_best
    tmax = jnp.where(t1x < tmax, t1x, tmax)
    tmax = jnp.where(t1y < tmax, t1y, tmax)
    tmax = jnp.where(t1z < tmax, t1z, tmax)
    return tmin <= tmax


def _traverse_tile(
    nodes, soup, n_nodes, rays_t, coeffs, skip, options, max_leaf, root=None
):
    """One tile: rays_t fields are (T, ...) SoA. ``skip`` is an optional
    per-ray (T,) uint32 skip-prim array overriding options.skip_prim_id.
    ``root`` is an optional per-ray int32 start-node array (the two-level
    scene graph roots each ray at its instance's sub-tree)."""
    org, dir, min_t, max_t = rays_t
    dt = org.dtype
    T = org.shape[0]
    ox, oy, oz = org[:, 0], org[:, 1], org[:, 2]
    inv = jnp.where(
        jnp.abs(dir) < jnp.finfo(dt).eps,
        jnp.copysign(jnp.array(jnp.inf, dt), dir),
        1.0 / jnp.where(jnp.abs(dir) < jnp.finfo(dt).eps, 1.0, dir),
    )
    ix, iy, iz = inv[:, 0], inv[:, 1], inv[:, 2]
    nx, ny, nz = dir[:, 0] < 0, dir[:, 1] < 0, dir[:, 2] < 0

    n = jnp.int32(n_nodes)
    lpos = jnp.arange(max_leaf, dtype=jnp.int32)

    # start done when max_t < min_t (used for padding lanes)
    start = jnp.zeros_like(min_t, jnp.int32) if root is None else root
    cur0 = jnp.where(max_t < min_t, n, start)
    t0 = max_t
    zero = jnp.zeros_like(max_t)
    u0 = zero
    v0 = zero
    pid0 = zero.astype(jnp.uint32) + jnp.uint32(INVALID_PRIM_ID)

    def inner_cond(c):
        return c[0]

    def inner_body(c):
        _, cur, lcnt, loff, lskp, t = c
        safe = jnp.minimum(cur, n - 1)
        row = jnp.take(nodes, safe, axis=0)  # (T, 12)
        active = cur < n
        hit = _slab_soa(row, ox, oy, oz, ix, iy, iz, nx, ny, nz, min_t, t)
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
        # park the hit leaf's own escape index: after the drain the ray
        # must resume at skip[leaf], NOT leaf+1 — pack_scene_multi remaps
        # a sub-tree's terminal skip to the global sentinel, so leaf+1
        # would walk into the next mesh's root.
        lskp = jnp.where(leaf_hit, skp, lskp)
        pending = jnp.any(advance & (cur < n))
        return pending, cur, lcnt, loff, lskp, t

    def outer_cond(s):
        return jnp.any(s[0] < n)

    def outer_body(s):
        cur, t, u, v, pid = s
        # Phase A: drive every ray to its next hit leaf (or termination)
        _, cur, lcnt, loff, lskp, _ = jax.lax.while_loop(
            inner_cond,
            inner_body,
            # lcnt/loff derive from cur (not fresh zeros) so their
            # varying-over-mesh type matches the loop body under shard_map
            (jnp.any(cur < n), cur, cur * 0, cur * 0, cur, t),
        )
        # Phase B: vectorized leaf test
        has = lcnt > 0
        rows_idx = jnp.clip(loff[:, None] + lpos[None, :], 0, soup.shape[0] - 1)
        rows = jnp.take(soup, rows_idx, axis=0)  # (T, L, 12)
        p0 = rows[..., 0:3]
        p1 = rows[..., 3:6]
        p2 = rows[..., 6:9]
        pids = _bitcast_i32(rows[..., 9]).astype(jnp.uint32)
        coeffs_l = jax.tree_util.tree_map(lambda x: x[:, None], coeffs)
        valid, tt, uu, vv = tri.intersect_triangles(
            coeffs_l,
            org[:, None, :],
            min_t[:, None],
            t[:, None],
            p0,
            p1,
            p2,
            cull_back_face=options.cull_back_face,
            exact_edge_fallback=options.exact_edge_fallback,
        )
        valid = valid & (lpos[None, :] < lcnt[:, None]) & has[:, None]
        valid = apply_trace_filters(
            valid,
            pids,
            options.prim_ids_range,
            skip if skip is not None else options.skip_prim_id,
        )
        big = jnp.array(jnp.finfo(dt).max, dt)
        t_m = jnp.where(valid, tt, big)
        t_leaf = jnp.min(t_m, axis=-1)
        is_best = valid & (t_m == t_leaf[:, None])
        best_pos = jnp.max(jnp.where(is_best, lpos[None, :], -1), axis=-1)
        got = best_pos >= 0
        sel = jnp.maximum(best_pos, 0)[:, None]
        take1 = lambda a: jnp.take_along_axis(a, sel, axis=1)[:, 0]
        upd = got & (t_leaf <= t)
        t = jnp.where(upd, t_leaf, t)
        u = jnp.where(upd, take1(uu), u)
        v = jnp.where(upd, take1(vv), v)
        pid = jnp.where(upd, take1(pids), pid)
        # resume at the drained leaf's skip link (NOT cur + 1: a
        # sub-tree's last leaf skips to the global sentinel in
        # multi-mesh tables — see pack_scene_multi)
        cur = jnp.where(has, lskp, cur)
        return cur, t, u, v, pid

    _, t, u, v, pid = jax.lax.while_loop(
        outer_cond, outer_body, (cur0, t0, u0, v0, pid0)
    )
    hit = t < max_t
    return Hits(
        t=t,
        u=jnp.where(hit, u, zero),
        v=jnp.where(hit, v, zero),
        prim_id=jnp.where(hit, pid, jnp.uint32(INVALID_PRIM_ID)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_nodes", "options", "max_leaf", "tile", "skip_is_array"),
)
def _traverse_wavefront_jit(
    nodes, soup, n_nodes, rays, skip_prim_id, options, max_leaf, tile,
    skip_is_array, root=None,
):
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
    # padding lanes get max_t < min_t so they start terminated
    min_t = pad_to(flat.min_t, 1.0)
    max_t = pad_to(flat.max_t, 0.0)
    skip = (
        pad_to(skip_prim_id.reshape(-1).astype(jnp.uint32))
        if skip_is_array
        else None
    )
    root_f = (
        pad_to(root.reshape(-1).astype(jnp.int32)) if root is not None else None
    )

    coeffs = tri.ray_coeffs(dirs)

    def tile_fn(args):
        o, d, mn, mx, cf = args[:5]
        rest = list(args[5:])
        opts_skip = rest.pop(0) if skip_is_array else None
        rt = rest.pop(0) if root is not None else None
        hits = _traverse_tile(
            nodes,
            soup,
            n_nodes,
            (o, d, mn, mx),
            cf,
            opts_skip,
            options,
            max_leaf,
            root=rt,
        )
        return hits

    reshape = lambda x: x.reshape((n_tiles, tile) + x.shape[1:])
    args = [reshape(org), reshape(dirs), reshape(min_t), reshape(max_t),
            jax.tree_util.tree_map(reshape, coeffs)]
    if skip_is_array:
        args.append(reshape(skip))
    if root is not None:
        args.append(reshape(root_f))
    hits = jax.lax.map(tile_fn, tuple(args))
    unpad = lambda x: x.reshape((n_tiles * tile,) + x.shape[2:])[:R]
    hits = jax.tree_util.tree_map(unpad, hits)
    return jax.tree_util.tree_map(lambda x: x.reshape(bs + x.shape[1:]), hits)


def traverse_wavefront(
    scene: PackedScene,
    rays: Rays,
    options: BVHTraceOptions = BVHTraceOptions(),
    skip_prim_id=None,
    max_leaf: int | None = 4,
    tile: int = 16384,
    root=None,
) -> Hits:
    """Trace a ray batch against a packed scene (fp32). ``root`` optionally
    gives each ray its start node (multi-mesh tables, pack_scene_multi).
    ``max_leaf`` may be None to use the scene's recorded largest leaf; an
    explicit value smaller than it raises (primitives past the unroll
    bound would be silently skipped)."""
    known = getattr(scene, "max_leaf", None)
    if max_leaf is None:
        if known is None:
            raise ValueError(
                "max_leaf=None needs a PackedScene built by pack_scene "
                "(this one carries no leaf-size record)"
            )
        max_leaf = max(known, 1)
    elif known is not None and known > max_leaf:
        raise ValueError(
            f"packed scene has leaves holding {known} primitives but "
            f"max_leaf={max_leaf}; pass max_leaf>={known} (or None)"
        )
    nodes = jnp.asarray(scene.nodes)
    soup = jnp.asarray(scene.soup)
    skip_is_array = skip_prim_id is not None
    return _traverse_wavefront_jit(
        nodes,
        soup,
        scene.num_nodes,
        rays,
        skip_prim_id if skip_is_array else jnp.uint32(0),
        options,
        max_leaf,
        tile,
        skip_is_array,
        root=root,
    )

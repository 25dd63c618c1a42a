"""Treelet-binned traversal — the incoherent-ray engine.

Fully-random ray batches defeat packet traversal (a 4096-ray packet
visits the union of all its rays' tree paths) and defeat the XLA
wavefront walk (dependent row-gather latency per lockstep step). The
TPU-shaped fix, standard on wide-SIMD ray tracers (ray binning /
stream tracing): split the tree into a few dozen *treelets*, test every
ray against every treelet AABB **densely** (no gathers — a (R, T) slab
test the VPU eats), then group rays by treelet and run the Pallas packet
kernel per group with the packet rooted at the treelet — inside one
treelet a sorted group is coherent again.

Pipeline (``traverse_bvh8_binned``):
  1. ``make_treelets``: expand the BVH8 root into <= ``target`` internal
     frontier nodes (greedy largest-surface-area, build time, host).
  2. per ray: K nearest treelet entries (t_entry, tid) via dense slab
     tests + ``lax.top_k`` — misses drop out here (a random ray that
     misses the scene costs ONE dense test, no traversal at all).
  3. pass k = 0..K-1: rays whose k-th treelet might still beat their
     best hit are Morton-sorted, grouped by treelet id into packet-
     aligned slots (each packet holds rays of ONE treelet; per-packet
     root rides a kernel input), traversed, and min-merged.

Hit records match the global traversal exactly: every treelet whose
entry distance can beat the ray's current best is visited, so the
nearest hit is never missed (same argument as the reference's two-level
NanoSG traversal, nanosg.h:779-874).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..build.bvh8 import BVH8Scene, EMPTY_BIG
from ..core.options import BVHTraceOptions, INVALID_PRIM_ID
from ..core.ray import Hits, Rays

LANES = 128


class Treelets:
    """Frontier of internal BVH8 nodes covering the whole tree (pytree:
    arrays are children, count is static aux)."""

    def __init__(self, roots, bmin, bmax, count):
        self.roots = roots  # (T,) int32 BVH8 node row ids
        self.bmin = bmin  # (T, 3) f32
        self.bmax = bmax  # (T, 3) f32
        self.count = count

    def tree_flatten(self):
        return (self.roots, self.bmin, self.bmax), (self.count,)


jax.tree_util.register_pytree_node(
    Treelets,
    lambda t: ((t.roots, t.bmin, t.bmax), (t.count,)),
    lambda aux, ch: Treelets(ch[0], ch[1], ch[2], aux[0]),
)


def _node_children(row):
    """Yield (meta, bmin, bmax, is_leaf) for real children of a node row."""
    for c in range(8):
        if row[8 * c] >= EMPTY_BIG:  # empty slot
            continue
        meta = float(row[64 + c])
        yield (
            int(meta),
            row[8 * c: 8 * c + 3].copy(),
            row[8 * c + 3: 8 * c + 6].copy(),
            meta < 0,
        )


def make_treelets(scene: BVH8Scene, target: int = 64):
    """Greedy frontier expansion: repeatedly split the largest-area
    frontier node until ``target`` treelets. Internal children join the
    frontier directly; leaf children become treelets rooted at synthetic
    single-child node rows appended to the table (inserted before the
    dummy park row so existing ids are untouched).

    Returns (Treelets, scene_with_synthetic_rows)."""
    nodes = np.asarray(scene.nodes)
    n_real = scene.num_nodes  # excludes the trailing dummy park row

    def node_box(nid):
        los, his = [], []
        for _, lo, hi, _ in _node_children(nodes[nid]):
            los.append(lo)
            his.append(hi)
        return np.min(los, axis=0), np.max(his, axis=0)

    def area(box):
        d = np.maximum(box[1] - box[0], 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    # frontier items: (root_id_or_None, box, leaf_spec_or_None)
    frontier = [(0, node_box(0), None)]
    while len(frontier) < target:
        best, best_a = -1, -1.0
        for i, (nid, box, leaf) in enumerate(frontier):
            if leaf is not None:
                continue  # leaf treelets don't expand
            kids = list(_node_children(nodes[nid]))
            if len(frontier) - 1 + len(kids) > target or len(kids) < 2:
                continue
            a = area(box)
            if a > best_a:
                best, best_a = i, a
        if best < 0:
            break
        nid, _, _ = frontier.pop(best)
        row = nodes[nid]
        for c in range(8):
            if row[8 * c] >= EMPTY_BIG:
                continue
            meta = int(row[64 + c])
            box = (row[8 * c: 8 * c + 3].copy(),
                   row[8 * c + 3: 8 * c + 6].copy())
            if meta >= 0:
                frontier.append((meta, box, None))
            else:
                cnt = int(row[72 + c])
                frontier.append((None, box, (-meta - 1, cnt)))

    # synthesize rows for leaf treelets
    synth = []
    roots = []
    for nid, box, leaf in frontier:
        if leaf is None:
            roots.append(nid)
            continue
        leaf_row, cnt = leaf
        r = np.zeros(128, np.float32)
        r[0:64:8] = EMPTY_BIG
        r[1:64:8] = EMPTY_BIG
        r[2:64:8] = EMPTY_BIG
        r[3:64:8] = -EMPTY_BIG
        r[4:64:8] = -EMPTY_BIG
        r[5:64:8] = -EMPTY_BIG
        r[0:3] = box[0]
        r[3:6] = box[1]
        r[64] = np.float32(-(leaf_row + 1))
        r[72] = np.float32(cnt)
        roots.append(n_real + len(synth))
        synth.append(r)
    if synth:
        nodes_aug = np.concatenate(
            [nodes[:n_real], np.stack(synth), nodes[n_real:]]
        )
        scene = scene._replace(nodes=nodes_aug)
        # existing child ids all point below n_real; only the dummy park
        # row moved (the kernel re-derives it from the table length)
    tl = Treelets(
        roots=np.asarray(roots, np.int32),
        bmin=np.stack([b[0] for _, b, _ in frontier]).astype(np.float32),
        bmax=np.stack([b[1] for _, b, _ in frontier]).astype(np.float32),
        count=len(frontier),
    )
    return tl, scene


@functools.partial(jax.jit, static_argnames=("K", "chunk"))
def _treelet_klists(org, dirs, min_t, max_t, bmin, bmax, K, chunk=65536):
    """Dense ray x treelet AABB test -> K nearest (t_entry, tid) slots.
    tid == T marks an empty slot. Chunked over rays so the (chunk, T)
    intermediates stay small."""
    R = org.shape[0]
    n_chunks = -(-R // chunk)
    pad = n_chunks * chunk - R
    org = jnp.pad(org, ((0, pad), (0, 0)))
    dirs = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    min_t = jnp.pad(min_t, (0, pad), constant_values=1.0)
    max_t = jnp.pad(max_t, (0, pad), constant_values=0.0)
    rs = lambda x: x.reshape((n_chunks, chunk) + x.shape[1:])
    t_entry, tid = jax.lax.map(
        lambda a: _treelet_klists_chunk(*a, bmin, bmax, K),
        (rs(org), rs(dirs), rs(min_t), rs(max_t)),
    )
    unrs = lambda x: x.reshape((n_chunks * chunk,) + x.shape[2:])[:R]
    return unrs(t_entry), unrs(tid)


def _treelet_klists_chunk(org, dirs, min_t, max_t, bmin, bmax, K):
    inv = jnp.where(
        jnp.abs(dirs) < jnp.finfo(jnp.float32).eps,
        jnp.copysign(jnp.float32(jnp.inf), dirs),
        1.0 / jnp.where(jnp.abs(dirs) < jnp.finfo(jnp.float32).eps, 1.0, dirs),
    )
    neg = dirs < 0
    lo = jnp.where(neg[:, None, :], bmax[None], bmin[None])  # (R, T, 3)
    hi = jnp.where(neg[:, None, :], bmin[None], bmax[None])
    mm = jnp.float32(1.00000024)
    t0 = (lo - org[:, None, :]) * inv[:, None, :]
    t1 = (hi - org[:, None, :]) * inv[:, None, :] * mm
    tmin = jnp.maximum(
        jnp.maximum(
            jnp.where(jnp.isnan(t0[..., 0]), -jnp.inf, t0[..., 0]),
            jnp.where(jnp.isnan(t0[..., 1]), -jnp.inf, t0[..., 1]),
        ),
        jnp.maximum(
            jnp.where(jnp.isnan(t0[..., 2]), -jnp.inf, t0[..., 2]),
            min_t[:, None],
        ),
    )
    tmax = jnp.minimum(
        jnp.minimum(
            jnp.where(jnp.isnan(t1[..., 0]), jnp.inf, t1[..., 0]),
            jnp.where(jnp.isnan(t1[..., 1]), jnp.inf, t1[..., 1]),
        ),
        jnp.minimum(
            jnp.where(jnp.isnan(t1[..., 2]), jnp.inf, t1[..., 2]),
            max_t[:, None],
        ),
    )
    hit = tmin <= tmax  # (R, T)
    big = jnp.float32(3.0e38)
    key = jnp.where(hit, tmin, big)
    T = bmin.shape[0]
    k_eff = min(K, T)
    neg_top, idx = jax.lax.top_k(-key, k_eff)  # ascending t_entry
    t_entry = -neg_top
    tid = jnp.where(t_entry < big, idx.astype(jnp.int32), jnp.int32(T))
    if k_eff < K:
        pad = K - k_eff
        t_entry = jnp.pad(t_entry, ((0, 0), (0, pad)), constant_values=big)
        tid = jnp.pad(tid, ((0, 0), (0, pad)), constant_values=T)
    return t_entry, tid


@functools.partial(jax.jit, static_argnames=("n_treelets", "packet", "total"))
def _bin_pass(org, dirs, min_t, cur_best_t, tid_k, t_entry_k, tl_roots,
              n_treelets, packet, total):
    """Scatter one pass's rays into packet-aligned treelet bins.

    Returns (binned ray SoA padded to ``total``, per-packet root ids,
    dest slot per ray [total-index], active mask)."""
    R = org.shape[0]
    T = n_treelets
    active = (tid_k < T) & (t_entry_k <= cur_best_t)
    key = jnp.where(active, tid_k, T)
    order = jnp.argsort(key)  # stable: preserves Morton pre-sort in-group
    key_s = jnp.take(key, order)
    counts = jnp.bincount(key_s, length=T + 1)[:T]
    padded = -(-counts // packet) * packet
    pad_off = jnp.concatenate(
        [jnp.zeros((1,), padded.dtype), jnp.cumsum(padded)[:-1]]
    )
    start = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]]
    )
    g = jnp.minimum(key_s, T - 1)
    rank = jnp.arange(R) - jnp.take(start, g)
    dest = jnp.where(
        key_s < T, jnp.take(pad_off, g) + rank, total - 1
    ).astype(jnp.int32)
    # slot -> treelet map via scatter-max (padding slots stay -1; a
    # packet's root is the max tid over its slots — all equal in-group)
    slot_tid = jnp.full((total,), -1, jnp.int32)
    slot_tid = slot_tid.at[dest].max(jnp.where(key_s < T, g, -1))
    pkt_tid = jnp.max(slot_tid.reshape(-1, packet), axis=1)
    pkt_root = jnp.where(
        pkt_tid >= 0, jnp.take(tl_roots, jnp.maximum(pkt_tid, 0)), 0
    )

    def scat(x, fill):
        out = jnp.full((total,) + x.shape[1:], fill, x.dtype)
        val = jnp.take(x, order, axis=0)
        live = (key_s < T)
        # inert fill for rays that landed on the shared dead slot
        val = jnp.where(
            live.reshape((-1,) + (1,) * (x.ndim - 1)), val,
            jnp.asarray(fill, x.dtype),
        )
        return out.at[dest].set(val)

    b_org = scat(org, 0.0)
    b_dir = scat(dirs, 1.0)
    b_min = scat(min_t, 1.0)
    # inert slots: max_t < min_t terminates them inside the kernel
    b_max = scat(jnp.where(active, cur_best_t, -1.0), 0.0)
    # map each ORIGINAL ray to its slot (or total-1 if inactive)
    inv_dest = jnp.full((R,), total - 1, jnp.int32)
    inv_dest = inv_dest.at[order].set(dest)
    return (b_org, b_dir, b_min, b_max), pkt_root, inv_dest, active


def traverse_bvh8_binned(
    scene: BVH8Scene,
    rays: Rays,
    options: BVHTraceOptions = BVHTraceOptions(),
    treelets: Treelets | None = None,
    n_treelets: int = 64,
    K: int = 4,
    sub: int = 8,
    **kw,
) -> Hits:
    """Incoherent-ray entry point: treelet-binned packet traversal.

    ``K`` is the max treelets visited per ray (pass count); rays whose
    current best hit precedes a pass's treelet entry skip that pass.
    ``sub`` defaults lower than the coherent path (1024-ray packets):
    bins are coherent but small."""
    from .pallas_packet import traverse_bvh8
    from .ray_sort import ray_sort_keys

    if treelets is None:
        treelets, scene = make_treelets(scene, n_treelets)
    T = treelets.count
    packet = sub * LANES

    bs = rays.batch_shape
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[len(bs):]), rays
    )
    R = flat.org.shape[0]
    # Morton pre-sort: stable group-sort then keeps bins spatially sorted
    lo = jnp.min(treelets.bmin, axis=0)
    hi = jnp.max(treelets.bmax, axis=0)
    skeys = ray_sort_keys(flat, lo, hi)
    sorder = jnp.argsort(skeys)
    flat = jax.tree_util.tree_map(lambda x: jnp.take(x, sorder, axis=0), flat)

    t_entry, tid = _treelet_klists(
        flat.org, flat.dir, flat.min_t, flat.max_t,
        jnp.asarray(treelets.bmin), jnp.asarray(treelets.bmax),
        K,
    )

    # worst-case bin padding R + T*(packet-1), plus one dead packet
    total = (-(-R // packet) + T + 1) * packet
    best = Hits(
        t=flat.max_t,
        u=jnp.zeros_like(flat.max_t),
        v=jnp.zeros_like(flat.max_t),
        prim_id=jnp.full(flat.max_t.shape, INVALID_PRIM_ID, jnp.uint32),
    )
    roots_np = jnp.asarray(treelets.roots)
    for k in range(K):
        (b_org, b_dir, b_min, b_max), pkt_root, inv_dest, active = _bin_pass(
            flat.org, flat.dir, flat.min_t, best.t,
            tid[:, k], t_entry[:, k], roots_np,
            T, packet, total,
        )
        if not bool(jnp.any(active)):
            break
        brays = Rays(org=b_org, dir=b_dir, min_t=b_min, max_t=b_max)
        h = traverse_bvh8(
            scene, brays, options, sub=sub, packet_roots=pkt_root, **kw
        )
        take = lambda x: jnp.take(x, inv_dest, axis=0)
        ht, hu, hv, hp = take(h.t), take(h.u), take(h.v), take(h.prim_id)
        got = active & (hp != jnp.uint32(INVALID_PRIM_ID)) & (ht <= best.t)
        best = Hits(
            t=jnp.where(got, ht, best.t),
            u=jnp.where(got, hu, best.u),
            v=jnp.where(got, hv, best.v),
            prim_id=jnp.where(got, hp, best.prim_id),
        )

    # unsort back to caller order
    inv = jnp.argsort(sorder)
    unsort = lambda x: jnp.take(x, inv, axis=0).reshape(bs + x.shape[1:])
    return jax.tree_util.tree_map(unsort, best)

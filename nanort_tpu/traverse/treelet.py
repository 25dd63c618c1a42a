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

Hit records match the global traversal exactly at ANY (T, K): passes
visit entries nearest-first and a pass is skipped once the ray's best
hit precedes its entry distance, so the nearest hit is never missed
(same argument as the reference's two-level NanoSG traversal,
nanosg.h:779-874). ``K`` is purely a perf knob: the dense phase counts
each ray's true entered-treelet total, and rays whose count exceeds
``K`` (their K-list was truncated) get a *completion sweep* over their
remaining entries with K2 >= the true count — so the miss class that a
truncated list could cause (a hit beyond the K-th entered box with
nothing closer) is closed unconditionally
(tests/test_treelet.py::test_completion_sweep_exactness).
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

# K-list selection strategy: K-round min-extraction (True) vs
# lax.top_k (False). Toggled module-globally so the jitted chunk fn
# stays cacheable; measured on TPU in tools/exp_r3_inco2.py.
_KLISTS_ITER = True


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


def make_treelets(scene: BVH8Scene, target: int = 64,
                  flat: bool = False):
    """Greedy frontier expansion: repeatedly split the largest-area
    frontier node until ``target`` treelets. Internal children join the
    frontier directly; leaf children become treelets rooted at synthetic
    single-child node rows appended to the table (inserted before the
    dummy park row so existing ids are untouched).

    ``flat=True`` replaces every treelet's BVH8 subtree with a synthetic
    SHALLOW tree over its leaf rows (fan-8 levels of consecutive-row
    groups): a ~220-row treelet costs ~5 pops to fully drain instead of
    ~57 subtree pops, and each row drains at most once — the right shape
    when packets drain most of the treelet anyway (fully-random rays
    measured 268 drains/packet on ~222-row treelets,
    tools/logs/exp_r5_inco.log). Same records: leaf children keep their
    (row, cnt) and exact child AABBs, boxes only cull.

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

    # synthesize rows for leaf treelets (and, with flat=True, shallow
    # replacement trees for every internal-rooted treelet)
    synth = []
    roots = []

    def _empty_row():
        r = np.zeros(128, np.float32)
        for k in range(3):
            r[k:64:8] = EMPTY_BIG
            r[3 + k:64:8] = -EMPTY_BIG
        return r

    def _emit_row(grp):
        """One synthetic BVH8 row over <= 8 children
        (lo, hi, meta, cnt, is_leaf); returns its node id."""
        r = _empty_row()
        ctr = np.stack([(lo + hi) * 0.5 for lo, hi, _, _, _ in grp])
        axis = int(np.argmax(np.ptp(ctr, axis=0))) if len(grp) > 1 else 0
        for c, (lo, hi, meta, cnt, is_leaf) in enumerate(grp):
            r[8 * c: 8 * c + 3] = lo
            r[8 * c + 3: 8 * c + 6] = hi
            r[64 + c] = meta
            r[72 + c] = float(cnt)
        # order axis rides the child-0 count lane (cnt + 16 * axis),
        # matching the collapse emitters
        r[72] = float(int(r[72]) + 16 * axis)
        rid = n_real + len(synth)
        synth.append(r)
        return rid

    def _flat_subtree(nid):
        """Replace nid's subtree with fan-8 levels over its leaf rows."""
        kids = []
        stack = [nid]
        while stack:
            i = stack.pop()
            row = nodes[i]
            for c in range(8):
                if row[8 * c] >= EMPTY_BIG:
                    continue
                meta = row[64 + c]
                if meta >= 0:
                    stack.append(int(meta))
                else:
                    cl = int(row[72 + c])
                    cnt = (cl & 15) if c == 0 else cl
                    kids.append((row[8 * c: 8 * c + 3].copy(),
                                 row[8 * c + 3: 8 * c + 6].copy(),
                                 float(meta), cnt, True))
        kids.sort(key=lambda k: -k[2])  # ascending leaf row id
        level = kids
        while len(level) > 8:
            nxt = []
            for i in range(0, len(level), 8):
                grp = level[i:i + 8]
                rid = _emit_row(grp)
                lo = np.min([g[0] for g in grp], axis=0)
                hi = np.max([g[1] for g in grp], axis=0)
                nxt.append((lo, hi, float(rid), 0, False))
            level = nxt
        return _emit_row(level)

    for nid, box, leaf in frontier:
        if leaf is None:
            roots.append(_flat_subtree(nid) if flat else nid)
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
def _treelet_klists(org, dirs, min_t, max_t, bmin, bmax, K, chunk=None):
    """Dense ray x treelet AABB test -> K nearest (t_entry, tid) slots.
    tid == T marks an empty slot. Chunked over rays so the (chunk, T)
    intermediates stay small (default: chunk * T ~ 2^24)."""
    if chunk is None:
        chunk = max(2048, (1 << 24) // max(int(bmin.shape[0]), 1))
    R = org.shape[0]
    n_chunks = -(-R // chunk)
    pad = n_chunks * chunk - R
    org = jnp.pad(org, ((0, pad), (0, 0)))
    dirs = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    min_t = jnp.pad(min_t, (0, pad), constant_values=1.0)
    max_t = jnp.pad(max_t, (0, pad), constant_values=0.0)
    rs = lambda x: x.reshape((n_chunks, chunk) + x.shape[1:])
    t_entry, tid, n_ent = jax.lax.map(
        lambda a: _treelet_klists_chunk(*a, bmin, bmax, K),
        (rs(org), rs(dirs), rs(min_t), rs(max_t)),
    )
    unrs = lambda x: x.reshape((n_chunks * chunk,) + x.shape[2:])[:R]
    return unrs(t_entry), unrs(tid), unrs(n_ent)


def _treelet_klists_chunk(org, dirs, min_t, max_t, bmin, bmax, K):
    # componentwise (chunk, T) slab tests: the earlier (chunk, T, 3)
    # broadcast form left XLA with a padded minor-3 layout and ran ~5x
    # below VPU rate. Sign-free form: per axis, near = min of the two
    # plane products (NaN folds to -inf: 0 * inf on a degenerate axis
    # means unconstrained), far = max (NaN folds to +inf), matching the
    # reference's per-axis fold order (nanort.h:2303-2348) and its
    # conservative *1.00000024 on the far product.
    mm = jnp.float32(1.00000024)
    inf = jnp.float32(jnp.inf)
    tmin = jnp.broadcast_to(min_t[:, None], (org.shape[0], bmin.shape[0]))
    tmax = jnp.broadcast_to(max_t[:, None], (org.shape[0], bmin.shape[0]))
    for a in range(3):
        d = dirs[:, a]
        tiny = jnp.abs(d) < jnp.finfo(jnp.float32).eps
        inv = jnp.where(
            tiny, jnp.copysign(inf, d),
            1.0 / jnp.where(tiny, 1.0, d),
        )[:, None]
        o = org[:, a][:, None]
        pa = (bmin[None, :, a] - o) * inv
        pb = (bmax[None, :, a] - o) * inv
        near = jnp.minimum(
            jnp.where(jnp.isnan(pa), -inf, pa),
            jnp.where(jnp.isnan(pb), -inf, pb),
        )
        far = jnp.maximum(
            jnp.where(jnp.isnan(pa), inf, pa),
            jnp.where(jnp.isnan(pb), inf, pb),
        ) * mm
        tmin = jnp.maximum(tmin, near)
        tmax = jnp.minimum(tmax, far)
    hit = tmin <= tmax  # (R, T)
    big = jnp.float32(3.0e38)
    key = jnp.where(hit, tmin, big)
    T = bmin.shape[0]
    k_eff = min(K, T)
    if _KLISTS_ITER:
        # K-round min-extraction instead of lax.top_k: ~4 VPU ops per
        # (R, T) element per round beats the sort-based top_k lowering
        # for small K. Ties broken by lowest tid (argmin), which matches
        # top_k's index order among equal keys closely enough — the
        # sweep contract only needs the SET of entries ascending-ish;
        # exactness never depends on tie order (module docstring).
        iot = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
        te_l, ti_l = [], []
        for _ in range(k_eff):
            m = jnp.min(key, axis=1)
            am = jnp.argmin(key, axis=1).astype(jnp.int32)
            te_l.append(m)
            ti_l.append(am)
            key = jnp.where(iot == am[:, None], big, key)
        t_entry = jnp.stack(te_l, axis=1)
        idx = jnp.stack(ti_l, axis=1)
    else:
        neg_top, idx = jax.lax.top_k(-key, k_eff)  # ascending t_entry
        t_entry = -neg_top
    tid = jnp.where(t_entry < big, idx.astype(jnp.int32), jnp.int32(T))
    if k_eff < K:
        pad = K - k_eff
        t_entry = jnp.pad(t_entry, ((0, 0), (0, pad)), constant_values=big)
        tid = jnp.pad(tid, ((0, 0), (0, pad)), constant_values=T)
    # exact entered-count per ray: the K-list silently truncates rays
    # entering more than K boxes; the caller routes those through a
    # completion sweep (unconditional-exactness contract)
    n_ent = jnp.sum(hit.astype(jnp.int32), axis=1)
    return t_entry, tid, n_ent


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


@functools.partial(jax.jit, static_argnames=("T", "C", "packet"))
def _pair_order(td, te, best_t, T, C, packet):
    """Group the (R, C) candidate pair grid by treelet id.

    Returns (order over the flattened grid with active pairs first
    grouped by tid, grouped keys, per-treelet active counts, total
    active count, exact packet-aligned slot need).

    One stable argsort over the full grid. A count + scatter-compact +
    bucket-argsort split (sort only the ~n_act live pairs) was built
    and measured NEGATIVE at stage level — the pure elementwise count
    pass alone (key + cumsum + bincount over the 33.5M-entry round-2
    grid) costs 312 ms vs 614 ms for this whole function: grouping is
    grid-traffic-bound, not sort-bound
    (tools/experiments/incoherent_random_ceiling.md, exp_r5_inco2)."""
    act = (td < T) & (te <= best_t[:, None])
    key = jnp.where(act, td, T).astype(jnp.int32).reshape(-1)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    key_s = jnp.take(key, order)
    counts = jnp.bincount(key_s, length=T + 1)[:T].astype(jnp.int32)
    n_padded = jnp.sum(-(-counts // packet) * packet)  # exact slot need
    return order, key_s, counts, jnp.sum(counts), n_padded


@functools.partial(
    jax.jit, static_argnames=("T", "C", "packet", "n_slots")
)
def _pair_fill(order_j, key_j, counts, comps, best_t, T, C, packet, n_slots):
    """Assemble packet-aligned ray slots for the first len(order_j)
    grouped pairs via ONE index scatter + ONE row gather (TPU scalar
    gathers run ~110M elem/s but (n, 8)-row gathers move ~12x more per
    index, so the whole SoA rides one (R+1, 8) matrix whose last row is
    an inert pad ray; the ray's current-best far bound is refreshed into
    column 7 with a single vectorized column write per sweep).

    Returns (slot ray SoA components, per-packet roots as treelet ids,
    per-slot source ray index [R = pad])."""
    R = comps.shape[0] - 1
    j = jnp.arange(order_j.shape[0], dtype=jnp.int32)
    g = jnp.minimum(key_j, T - 1)
    live = key_j < T
    padded = (-(-counts // packet) * packet).astype(jnp.int32)
    pad_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    rank = j - jnp.take(start, g)
    dest = jnp.where(live, jnp.take(pad_off, g) + rank, n_slots - 1)
    ray_idx = (order_j // C).astype(jnp.int32)  # pair grid is (R, C)

    slot_src = jnp.full((n_slots,), R, jnp.int32)
    slot_src = slot_src.at[dest].set(jnp.where(live, ray_idx, R))
    # per-slot far bound = the ray's current best (in-kernel pruning);
    # pad row keeps max_t = -1 < min_t = 1, an inert slot
    comps = comps.at[:R, 7].set(best_t)
    rows = jnp.take(comps, slot_src, axis=0)  # (n_slots, 8)
    ox, oy, oz, dx, dy, dz, mint, maxt = (rows[:, k] for k in range(8))
    slot_tid = jnp.full((n_slots,), -1, jnp.int32)
    slot_tid = slot_tid.at[dest].max(jnp.where(live, g, -1))
    pkt_tid = jnp.max(slot_tid.reshape(-1, packet), axis=1)
    return (ox, oy, oz, dx, dy, dz, mint, maxt), pkt_tid, slot_src


@jax.jit
def _pair_merge(best, slot_t, slot_u, slot_v, slot_pid, slot_src):
    """Fold slot hit records back per ray: scatter-min t, then pick one
    winning slot per ray (max slot index among equal-t winners — equal-t
    ties are traversal-order-defined everywhere in this package) and
    gather its full record so (t, u, v, prim_id) stay consistent."""
    R = best.t.shape[0]
    inf = jnp.float32(jnp.inf)
    valid = (slot_pid != jnp.uint32(INVALID_PRIM_ID)) & (slot_src < R)
    tval = jnp.where(valid, slot_t, inf)
    src = jnp.where(valid, slot_src, R)
    cand = jnp.full((R + 1,), inf, slot_t.dtype).at[src].min(tval)
    win = valid & (tval <= jnp.take(cand, src))
    wslot = (
        jnp.full((R + 1,), -1, jnp.int32)
        .at[src]
        .max(jnp.where(win, jnp.arange(slot_t.shape[0], dtype=jnp.int32), -1))
    )[:R]
    got = (wslot >= 0) & (cand[:R] <= best.t)
    ws = jnp.maximum(wslot, 0)
    # winner record rides one packed (R, 4) row gather (core/rowpack)
    from ..core.rowpack import permute_rows

    rec = permute_rows(
        dict(t=slot_t, u=slot_u, v=slot_v, pid=slot_pid), ws)
    return Hits(
        t=jnp.where(got, rec["t"], best.t),
        u=jnp.where(got, rec["u"], best.u),
        v=jnp.where(got, rec["v"], best.v),
        prim_id=jnp.where(got, rec["pid"], best.prim_id),
    )


def _next_bucket(n, packet):
    """Smallest power-of-two >= n, packet-aligned (bounds the number of
    distinct compiled shapes per (scene, config) to ~log2 buckets)."""
    b = packet
    while b < n:
        b *= 2
    return -(-b // packet) * packet


def traverse_bvh8_binned(
    scene: BVH8Scene,
    rays: Rays,
    options: BVHTraceOptions = BVHTraceOptions(),
    treelets: Treelets | None = None,
    n_treelets: int = 512,  # measured optimum on the 1M-tri random bench
    K: int = 8,
    sub: int = 8,
    octant_major: bool = False,  # pack same-octant rays adjacently
    # within each treelet bin (direction-incoherent batches)
    _complete: bool = True,  # test hook: False disables the completion
    # sweep (exposing the K-truncation miss class the sweep closes)
    **kw,
) -> Hits:
    """Incoherent-ray entry point: treelet-binned packet traversal.

    Two pair-sweep rounds instead of K sequential passes (profiled: the
    per-pass scatter assembly + kernel launch overhead at ~1.5 s/pass
    dwarfed the actual traversal): round 1 bins every ray to its single
    nearest entered treelet and traverses; round 2 expands the remaining
    (ray, treelet) candidate pairs — pruned by round 1's best hit, which
    deactivates most of them — into one flat packet-aligned sweep. ``K``
    caps treelets *entered* per ray (see module docstring for the
    coverage rule), no longer the number of kernel launches.

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
    # Morton pre-sort: stable group-sort then keeps bins spatially sorted.
    # octant_major packs same-direction rays adjacently WITHIN each
    # treelet bin (the stable group-sort preserves this order), shrinking
    # each packet's visited-node union for direction-incoherent batches.
    lo = jnp.min(treelets.bmin, axis=0)
    hi = jnp.max(treelets.bmax, axis=0)
    skeys = ray_sort_keys(flat, lo, hi, octant_major=octant_major)
    sorder = jnp.argsort(skeys)
    from ..core.rowpack import permute_rows

    flat = permute_rows(flat, sorder)

    t_entry, tid, n_ent = _treelet_klists(
        flat.org, flat.dir, flat.min_t, flat.max_t,
        jnp.asarray(treelets.bmin), jnp.asarray(treelets.bmax),
        K,
    )

    def make_comps(fl):
        """(R+1, 8) ray-SoA matrix [ox oy oz dx dy dz min_t max_t-slot];
        the final row is an inert pad ray (max_t -1 < min_t 1)."""
        n = fl.org.shape[0]
        m = jnp.concatenate(
            [fl.org, fl.dir, fl.min_t[:, None],
             jnp.full((n, 1), -1.0, fl.org.dtype)], axis=1
        )
        pad = jnp.asarray(
            [[0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0, -1.0]], m.dtype
        )
        return jnp.concatenate([m, pad], axis=0)

    comps = make_comps(flat)
    best = Hits(
        t=flat.max_t,
        u=jnp.zeros_like(flat.max_t),
        v=jnp.zeros_like(flat.max_t),
        prim_id=jnp.full(flat.max_t.shape, INVALID_PRIM_ID, jnp.uint32),
    )
    roots_dev = jnp.asarray(treelets.roots)

    def sweep(td, te, cps, bst):
        """One packet-aligned pair sweep over candidate (ray, treelet)
        columns; returns the min-merged best records (or bst unchanged
        when no pair survives the bst.t pruning)."""
        C = td.shape[1]
        if C == 0:
            return bst
        order, key_s, counts, n_act, n_padded = _pair_order(
            td, te, bst.t, T, C, packet
        )
        n_act = int(n_act)  # one host sync per sweep
        if n_act == 0:
            return bst
        # static-shape bucket over the EXACT packet-aligned slot need
        # (a worst-case T*(packet-1) pad estimate doubled the gather
        # traffic at large T)
        n_slots = _next_bucket(int(n_padded) + packet, packet)
        j_cap = min(int(td.shape[0]) * C, n_slots)
        order_j = jax.lax.slice(order, (0,), (j_cap,))
        key_j = jax.lax.slice(key_s, (0,), (j_cap,))
        slot_comps, pkt_tid, slot_src = _pair_fill(
            order_j, key_j, counts, cps, bst.t, T, C, packet, n_slots
        )
        pkt_root = jnp.where(
            pkt_tid >= 0,
            jnp.take(roots_dev, jnp.maximum(pkt_tid, 0)),
            0,
        )
        ox, oy, oz, dx, dy, dz, mint, maxt = slot_comps
        brays = Rays(
            org=jnp.stack([ox, oy, oz], axis=-1),
            dir=jnp.stack([dx, dy, dz], axis=-1),
            min_t=mint,
            max_t=maxt,
        )
        h = traverse_bvh8(
            scene, brays, options, sub=sub, packet_roots=pkt_root, **kw
        )
        return _pair_merge(bst, h.t, h.u, h.v, h.prim_id, slot_src)

    for cols in (slice(0, 1), slice(1, K)):
        best = sweep(tid[:, cols], t_entry[:, cols], comps, best)

    # ---- completion sweep: unconditional exactness at any (T, K) ----
    # Rays that ENTERED more than K treelet boxes had their K-list
    # truncated; a hit beyond the K-th entry could be missed. Re-list
    # exactly those rays with K2 >= their true entered count and sweep
    # the remaining columns, pruned by the best hits found so far.
    max_ent = int(n_ent.max()) if (R and _complete) else 0
    if max_ent > K:
        ov = np.nonzero(np.asarray(n_ent > K))[0]
        K2 = min(_next_pow2(max_ent), T)
        R_sub = _next_pow2(max(len(ov), 1))
        idx = np.full(R_sub, R, np.int64)
        idx[: len(ov)] = ov
        live = jnp.asarray(idx < R)
        idx_c = jnp.asarray(np.minimum(idx, max(R - 1, 0)))
        take = lambda x: jnp.take(x, idx_c, axis=0)
        sub_flat = jax.tree_util.tree_map(take, flat)
        # pad rows become inert rays (max_t < min_t)
        sub_flat = sub_flat.__class__(
            org=sub_flat.org,
            dir=sub_flat.dir,
            min_t=jnp.where(live, sub_flat.min_t, 1.0),
            max_t=jnp.where(live, sub_flat.max_t, 0.0),
        )
        te2, td2, _ = _treelet_klists(
            sub_flat.org, sub_flat.dir, sub_flat.min_t, sub_flat.max_t,
            jnp.asarray(treelets.bmin), jnp.asarray(treelets.bmax),
            K2,
        )
        td2 = jnp.where(live[:, None], td2, T)
        sub_best = jax.tree_util.tree_map(take, best)
        sub_best = sweep(
            td2[:, K:], te2[:, K:], make_comps(sub_flat), sub_best
        )
        scatter_idx = jnp.asarray(idx)  # pad rows (== R) drop in scatter
        best = jax.tree_util.tree_map(
            lambda full, s: full.at[scatter_idx].set(
                s, mode="drop"
            ),
            best,
            sub_best,
        )

    # unsort back to caller order: one packed row scatter (no inverse
    # permutation ever materializes — core/rowpack)
    from ..core.rowpack import unpermute_rows

    out = unpermute_rows(best, sorder)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(bs + x.shape[1:]), out)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p

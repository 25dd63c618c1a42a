"""Sharded-scene traversal: scenes larger than one chip's HBM.

The reference's only capacity escape hatch is the 2G-prim cap plus manual
chunking through NanoSG (nanort.h:5-8; SURVEY.md §2.7 "Distributed
backend"). The TPU-native design implemented here:

* the triangle set is split into spatially-compact chunks (Morton-ordered
  centroid ranges), one BVH + packed wavefront table per chunk, padded to
  a common shape and **sharded one-chunk-per-device** over the mesh axis;
* rays are sharded over the same axis; traversal runs ``n_devices``
  rounds of (trace local chunk -> merge best hit -> ``ppermute`` the ray
  block + carried hits to the ring neighbor). After a full circle every
  ray has visited every chunk and is back home — a systolic all-to-all
  that rides ICI with one block exchange per round, never materializing
  more than R/n rays or one chunk per chip.
* hit records carry *global* prim ids (per-chunk permutation tables map
  local leaf order back), so results are directly comparable to a
  single-BVH traversal of the unsplit scene.

This is the correctness-level implementation validated on the virtual
8-device CPU mesh (tests/test_sharded_scene.py); the same layout scales
to real >HBM scenes by swapping the wavefront engine for the packet
kernel per chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.options import BVHBuildOptions, BVHTraceOptions, INVALID_PRIM_ID
from ..core.ray import Hits, Rays
from ..ops.triangle import TriangleMesh

def _morton_order(centroids: np.ndarray) -> np.ndarray:
    lo = centroids.min(0)
    ext = np.maximum(centroids.max(0) - lo, 1e-30)
    q = np.clip((centroids - lo) / ext * 1023.0, 0, 1023).astype(np.uint64)

    def expand(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = (expand(q[:, 0]) << np.uint64(2)) | (
        expand(q[:, 1]) << np.uint64(1)
    ) | expand(q[:, 2])
    return np.argsort(code, kind="stable")


class ShardedScene:
    """Per-chunk packed tables stacked on a leading chunk axis (pytree).

    nodes:  (C, N_max, 12) f32   padded wavefront node tables
    soups:  (C, M_max, 12) f32   padded leaf-ordered triangle rows
    perms:  (C, M_max)     i32   chunk-local prim id -> GLOBAL prim id

    With ``packet=True`` at build time, per-chunk BVH8 packet-kernel
    tables ride along (leaf pid lanes already remapped to GLOBAL ids):

    nodes8: (C, R_max, 128) f32  padded BVH8 node rows (pad rows are
                                 inert empty-box rows, so the kernel's
                                 park-on-last-row trick stays safe)
    leafs8: (C, L_max, 128) f32  padded leaf rows
    """

    def __init__(self, nodes, soups, perms, num_nodes, num_chunks,
                 nodes8=None, leafs8=None, depth8=0, max_leaf8=0):
        self.nodes = nodes
        self.soups = soups
        self.perms = perms
        self.num_nodes = num_nodes  # padded N_max (static)
        self.num_chunks = num_chunks
        self.nodes8 = nodes8
        self.leafs8 = leafs8
        self.depth8 = depth8  # max over chunks (stack sizing)
        self.max_leaf8 = max_leaf8


jax.tree_util.register_pytree_node(
    ShardedScene,
    lambda s: (
        (s.nodes, s.soups, s.perms, s.nodes8, s.leafs8),
        (s.num_nodes, s.num_chunks, s.depth8, s.max_leaf8),
    ),
    lambda aux, ch: ShardedScene(
        ch[0], ch[1], ch[2], aux[0], aux[1],
        nodes8=ch[3], leafs8=ch[4], depth8=aux[2], max_leaf8=aux[3],
    ),
)


def build_scene_chunks(
    mesh: TriangleMesh,
    n_chunks: int,
    build_options: BVHBuildOptions = BVHBuildOptions(),
    packet: bool = False,
) -> ShardedScene:
    """Split a mesh into spatially-compact chunks, one packed BVH each.

    ``packet=True`` additionally builds per-chunk BVH8 tables for the
    Pallas packet kernel (the TPU fast path of the ring traversal); the
    leaf pid lanes are rewritten to GLOBAL prim ids at build time so the
    kernel's records need no per-chunk remap."""
    from .. import build_triangle_bvh
    from ..traverse.packed import pack_scene

    v = np.asarray(mesh.vertices, np.float32)
    f = np.asarray(mesh.faces).astype(np.int64)
    n_faces = f.shape[0]
    if n_chunks > n_faces:
        raise ValueError(f"more chunks ({n_chunks}) than faces ({n_faces})")
    cent = v[f].mean(axis=1)
    order = _morton_order(cent)
    bounds = np.linspace(0, n_faces, n_chunks + 1).astype(np.int64)

    packs, perms, s8s = [], [], []
    for c in range(n_chunks):
        sel = order[bounds[c]: bounds[c + 1]]  # global prim ids, compact
        sub_f = f[sel]
        sub_mesh = TriangleMesh(
            vertices=jnp.asarray(v), faces=jnp.asarray(sub_f)
        )
        bvh, _ = build_triangle_bvh(sub_mesh, build_options)
        pk = pack_scene(bvh, v, sub_f)
        packs.append(pk)
        # soup row j holds chunk-local prim id indices[j]; map -> global
        perms.append(sel.astype(np.int32))
        if packet:
            from ..build.bvh8 import MAX_LEAF_TRIS, collapse_bvh8

            if build_options.max_leaf_primitives > MAX_LEAF_TRIS:
                raise ValueError(
                    "packet chunks need max_leaf_primitives <= 10"
                )
            s8 = collapse_bvh8(bvh, v, sub_f)
            # rewrite pid lanes chunk-local -> global (slots beyond a
            # row's count are never read, remap them unconditionally)
            leafs = s8.leafs.copy()
            local = leafs[:, 90:100].astype(np.int64)
            leafs[:, 90:100] = sel[np.minimum(local, len(sel) - 1)].astype(
                np.float32
            )
            s8s.append(s8._replace(leafs=leafs))

    n_max = max(p.num_nodes for p in packs)
    m_max = max(p.num_prims for p in packs)
    nodes = np.zeros((n_chunks, n_max, 12), np.float32)
    soups = np.zeros((n_chunks, m_max, 12), np.float32)
    perm_t = np.zeros((n_chunks, m_max), np.int32)
    for c, p in enumerate(packs):
        n, m = p.num_nodes, p.num_prims
        nodes[c, :n] = p.nodes
        # padding rows: inert branches (inverted box is implicit — count 0
        # and skip=N_max terminate immediately); rows n..N_max are only
        # reachable via a real sub-tree's terminal skip (== n), so give
        # every padding row skip = N_max
        if n < n_max:
            nodes[c, n:, 8] = np.full(n_max - n, n_max, np.int32).view(
                np.float32
            )
        soups[c, :m] = p.soup
        perm_t[c, :m] = perms[c]
        if m < m_max:
            perm_t[c, m:] = 0
    nodes8 = leafs8 = None
    depth8 = max_leaf8 = 0
    if packet:
        from ..build.bvh8 import EMPTY_BIG

        r_max = max(s.nodes.shape[0] for s in s8s)
        l_max = max(s.leafs.shape[0] for s in s8s)
        nodes8 = np.zeros((n_chunks, r_max, 128), np.float32)
        # pad rows must be inert EMPTY rows: the kernel parks on the
        # LAST row of the table, and all-zero boxes (lo == hi == 0) are
        # hittable by rays through the origin
        nodes8[:, :, 0:64:8] = EMPTY_BIG
        nodes8[:, :, 1:64:8] = EMPTY_BIG
        nodes8[:, :, 2:64:8] = EMPTY_BIG
        nodes8[:, :, 3:64:8] = -EMPTY_BIG
        nodes8[:, :, 4:64:8] = -EMPTY_BIG
        nodes8[:, :, 5:64:8] = -EMPTY_BIG
        leafs8 = np.zeros((n_chunks, l_max, 128), np.float32)
        for c, s in enumerate(s8s):
            nodes8[c, : s.nodes.shape[0]] = s.nodes
            leafs8[c, : s.leafs.shape[0]] = s.leafs
        depth8 = max(s.depth for s in s8s)
        max_leaf8 = max(s.max_leaf for s in s8s)
    return ShardedScene(
        nodes=nodes,
        soups=soups,
        perms=perm_t,
        num_nodes=n_max,
        num_chunks=n_chunks,
        nodes8=nodes8,
        leafs8=leafs8,
        depth8=depth8,
        max_leaf8=max_leaf8,
    )


@functools.partial(
    jax.jit, static_argnames=("options", "tile", "mesh_ctx", "n_nodes")
)
def _sharded_scene_impl(nodes, soups, perms, rays, options, tile, mesh_ctx,
                        n_nodes):
    from ..traverse.packed import PackedScene
    from ..traverse.wavefront import traverse_wavefront

    mesh = mesh_ctx.mesh
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    def local(nodes_l, soups_l, perms_l, rays_l):
        # shard_map blocks carry a leading chunk axis of 1
        nodes_c = nodes_l[0]
        soups_c = soups_l[0]
        perms_c = perms_l[0]
        scene_c = PackedScene(nodes_c, soups_c, n_nodes, soups_c.shape[0])

        big = jnp.float32(3.0e38)
        best = Hits(
            t=rays_l.max_t + 0.0,
            u=jnp.zeros_like(rays_l.max_t),
            v=jnp.zeros_like(rays_l.max_t),
            prim_id=jnp.full_like(
                rays_l.max_t, INVALID_PRIM_ID, jnp.uint32
            ),
        )

        def round_body(i, carry):
            rays_c, best_c = carry
            # tighten each visiting ray's window by its carried best
            r = rays_c._replace(max_t=jnp.minimum(rays_c.max_t, best_c.t))
            h = traverse_wavefront(scene_c, r, options, tile=tile)
            got = h.prim_id != jnp.uint32(INVALID_PRIM_ID)
            gpid = jnp.take(
                perms_c, jnp.where(got, h.prim_id, 0).astype(jnp.int32)
            ).astype(jnp.uint32)
            upd = got & (h.t <= best_c.t)
            best_c = Hits(
                t=jnp.where(upd, h.t, best_c.t),
                u=jnp.where(upd, h.u, best_c.u),
                v=jnp.where(upd, h.v, best_c.v),
                prim_id=jnp.where(upd, gpid, best_c.prim_id),
            )
            # systolic rotate: ray block + carried best move one hop
            perm = [(d, (d + 1) % n_dev) for d in range(n_dev)]
            shift = lambda x: jax.lax.ppermute(x, axis, perm)
            rays_c = jax.tree_util.tree_map(shift, rays_c)
            best_c = jax.tree_util.tree_map(shift, best_c)
            return rays_c, best_c

        _, best = jax.lax.fori_loop(0, n_dev, round_body, (rays_l, best))
        hit = best.prim_id != jnp.uint32(INVALID_PRIM_ID)
        return Hits(
            t=best.t,
            u=jnp.where(hit, best.u, 0.0),
            v=jnp.where(hit, best.v, 0.0),
            prim_id=best.prim_id,
        )

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return shard_fn(nodes, soups, perms, rays)


def _chunk_scene8(scene: ShardedScene, nodes8_c, leafs8_c):
    from ..build.bvh8 import BVH8Scene

    return BVH8Scene(
        nodes=nodes8_c,
        leafs=leafs8_c,
        num_nodes=int(scene.nodes8.shape[1]) - 1,
        num_leaf_rows=int(scene.leafs8.shape[1]),
        depth=scene.depth8,
        max_leaf=scene.max_leaf8,
        width=8,
    )


def _merge_round(best_c, h):
    got = h.prim_id != jnp.uint32(INVALID_PRIM_ID)
    upd = got & (h.t <= best_c.t)
    return Hits(
        t=jnp.where(upd, h.t, best_c.t),
        u=jnp.where(upd, h.u, best_c.u),
        v=jnp.where(upd, h.v, best_c.v),
        prim_id=jnp.where(upd, h.prim_id, best_c.prim_id),
    )


@functools.partial(
    jax.jit, static_argnames=("options", "mesh_ctx", "scene_aux", "sub")
)
def _sharded_packet_impl(nodes8, leafs8, rays, options, mesh_ctx,
                         scene_aux, sub):
    """Ring traversal with the Pallas packet kernel per chunk (the TPU
    fast path VERDICT r2 #6 asked for; leaf pids are already global)."""
    from ..build.bvh8 import BVH8Scene
    from ..traverse.ray_sort import traverse_bvh8_sorted

    depth8, max_leaf8, r_rows, l_rows = scene_aux
    mesh = mesh_ctx.mesh
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    def local(nodes8_l, leafs8_l, rays_l):
        s8 = BVH8Scene(
            nodes=nodes8_l[0],
            leafs=leafs8_l[0],
            num_nodes=r_rows - 1,
            num_leaf_rows=l_rows,
            depth=depth8,
            max_leaf=max_leaf8,
            width=8,
        )
        best = Hits(
            t=rays_l.max_t + 0.0,
            u=jnp.zeros_like(rays_l.max_t),
            v=jnp.zeros_like(rays_l.max_t),
            prim_id=jnp.full_like(
                rays_l.max_t, INVALID_PRIM_ID, jnp.uint32
            ),
        )

        def round_body(i, carry):
            rays_c, best_c = carry
            r = rays_c._replace(
                max_t=jnp.minimum(rays_c.max_t, best_c.t)
            )
            h = traverse_bvh8_sorted(s8, r, options, sub=sub)
            best_c = _merge_round(best_c, h)
            perm = [(d, (d + 1) % n_dev) for d in range(n_dev)]
            shift = lambda x: jax.lax.ppermute(x, axis, perm)
            rays_c = jax.tree_util.tree_map(shift, rays_c)
            best_c = jax.tree_util.tree_map(shift, best_c)
            return rays_c, best_c

        _, best = jax.lax.fori_loop(0, n_dev, round_body, (rays_l, best))
        hit = best.prim_id != jnp.uint32(INVALID_PRIM_ID)
        return Hits(
            t=best.t,
            u=jnp.where(hit, best.u, 0.0),
            v=jnp.where(hit, best.v, 0.0),
            prim_id=best.prim_id,
        )

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return shard_fn(nodes8, leafs8, rays)


def sequential_chunk_traverse(
    scene: ShardedScene,
    rays: Rays,
    options: BVHTraceOptions = BVHTraceOptions(),
    sub: int = 8,
) -> Hits:
    """Single-chip proof of the packet-chunk layout: traverse every chunk
    sequentially through the packet kernel on ONE device, merging best
    hits between chunks — the same per-chunk tables and merge rule the
    multi-chip ring uses, without needing ``n_chunks`` real chips."""
    if scene.nodes8 is None:
        raise ValueError("build_scene_chunks(..., packet=True) required")
    from ..traverse.ray_sort import traverse_bvh8_sorted

    bs = rays.batch_shape
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[len(bs):]), rays
    )
    best = Hits(
        t=flat.max_t + 0.0,
        u=jnp.zeros_like(flat.max_t),
        v=jnp.zeros_like(flat.max_t),
        prim_id=jnp.full_like(flat.max_t, INVALID_PRIM_ID, jnp.uint32),
    )
    for c in range(scene.num_chunks):
        s8 = _chunk_scene8(
            scene, jnp.asarray(scene.nodes8[c]), jnp.asarray(scene.leafs8[c])
        )
        r = flat._replace(max_t=jnp.minimum(flat.max_t, best.t))
        h = traverse_bvh8_sorted(s8, r, options, sub=sub)
        best = _merge_round(best, h)
    hit = best.prim_id != jnp.uint32(INVALID_PRIM_ID)
    out = Hits(
        t=best.t,
        u=jnp.where(hit, best.u, 0.0),
        v=jnp.where(hit, best.v, 0.0),
        prim_id=best.prim_id,
    )
    return jax.tree_util.tree_map(
        lambda x: x.reshape(bs + x.shape[1:]), out
    )


def sharded_scene_traverse(
    scene: ShardedScene,
    rays: Rays,
    device_mesh: Mesh,
    options: BVHTraceOptions = BVHTraceOptions(),
    tile: int = 4096,
    engine: str = "auto",
    sub: int = 8,
) -> Hits:
    """Traverse rays against a chunk-sharded scene (see module docstring).

    ``device_mesh`` must have exactly ``scene.num_chunks`` devices; the
    flat leading ray axis must divide evenly by it.

    ``engine``: "packet" rides the Pallas packet kernel per chunk (TPU;
    needs ``build_scene_chunks(..., packet=True)``), "wavefront" the
    portable XLA walk; "auto" picks packet on TPU when the tables exist.
    """
    n = device_mesh.devices.size
    if n != scene.num_chunks:
        raise ValueError(
            f"scene has {scene.num_chunks} chunks but mesh has {n} devices"
        )
    bs = rays.batch_shape
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[len(bs):]), rays
    )
    if flat.org.shape[0] % n:
        raise ValueError("ray count not divisible by mesh size")
    if engine == "auto":
        engine = (
            "packet"
            if scene.nodes8 is not None
            and device_mesh.devices.reshape(-1)[0].platform not in (
                "cpu",
            )
            else "wavefront"
        )
    sh = NamedSharding(device_mesh, P(device_mesh.axis_names[0]))
    put = lambda x: jax.device_put(jnp.asarray(x), sh)
    rays_s = jax.tree_util.tree_map(put, flat)

    from .mesh import _MeshCtx

    if engine == "packet":
        if scene.nodes8 is None:
            raise ValueError(
                "engine='packet' needs build_scene_chunks(packet=True)"
            )
        hits = _sharded_packet_impl(
            put(scene.nodes8), put(scene.leafs8), rays_s, options,
            _MeshCtx(device_mesh),
            (scene.depth8, scene.max_leaf8,
             int(scene.nodes8.shape[1]), int(scene.leafs8.shape[1])),
            sub,
        )
    else:
        hits = _sharded_scene_impl(
            put(scene.nodes), put(scene.soups), put(scene.perms), rays_s,
            options, tile, _MeshCtx(device_mesh), scene.num_nodes,
        )
    return jax.tree_util.tree_map(
        lambda x: x.reshape(bs + x.shape[1:]), hits
    )

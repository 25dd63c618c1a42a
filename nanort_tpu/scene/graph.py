"""NanoSG-equivalent two-level scene graph (reference examples/nanosg/).

Host side: a ``Node`` hierarchy with non-owning mesh references, local
transforms and names (reference nanosg::Node, nanosg.h:322-506).
``Scene.commit()`` (reference Scene::Commit, nanosg.h:706-756):
  * composes world transforms down the tree,
  * builds one BVH per *unique* mesh (instances share builds — the
    reference lazily builds per node; sharing is strictly better),
  * packs all mesh BVHs into one concatenated wavefront table
    (pack_scene_multi) with per-instance roots,
  * flattens per-instance transform/inverse/normal matrices and world
    bounds into device arrays.

``Scene.traverse()`` reproduces Scene::Traverse semantics (nanosg.h:
779-874) as a wavefront: candidate instances whose world AABB the ray
hits are visited nearest-first (the reference's ListNodeIntersections
collects <= 64 sorted candidates; we sort the brute-force AABB-test
results — instance counts are tiny next to triangle counts), each
candidate batch is traced in local space via the shared bottom-level
table with per-ray roots, and hits convert back through the instance
transform keeping the nearest *world-space* distance. Early-out: a
candidate whose entry distance exceeds the current nearest world hit is
skipped (nanosg.h:805).

Deviations (documented): world-space ray min_t/max_t are honored (the
reference resets them to [0, inf) in local space — a TODO in nanosg.h:
816); world normals are normalized after the inverse-transpose transform.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.aabb import intersect_ray_aabb
from ..core.math import normalize, safe_inverse
from ..core.options import BVHBuildOptions, BVHTraceOptions, INVALID_PRIM_ID
from ..core.ray import Rays
from ..ops.triangle import TriangleMesh
from ..traverse.packed import pack_scene_multi
from ..traverse.wavefront import traverse_wavefront
from . import matrix as mat


class Node:
    """Scene node: optional mesh + local transform + children
    (reference nanosg::Node<T, M>)."""

    def __init__(self, name: str, mesh: TriangleMesh | None = None,
                 local_xform=None):
        self.name = name
        self.mesh = mesh
        self.local_xform = (
            mat.identity() if local_xform is None else np.asarray(local_xform)
        )
        self.children: list[Node] = []

    def add_child(self, node: "Node"):
        self.children.append(node)
        return node

    def set_local_xform(self, xform):
        """Replace this node's local transform (the reference's gizmo
        edit path: nanosg/main.cc ImGuizmo writes the node matrix, then
        Node::Update recomposes on the next Commit, nanosg.h:409-443).
        Call ``Scene.commit()`` afterwards — with the per-mesh BVH cache
        a transform-only re-commit skips every rebuild."""
        self.local_xform = np.asarray(xform, np.float64)

    def translate(self, dx=0.0, dy=0.0, dz=0.0):
        """Compose a translation onto the local transform (gizmo move)."""
        self.local_xform = mat.translate((dx, dy, dz)) @ self.local_xform


class SceneHits(NamedTuple):
    """Two-level hit record (reference nanosg::Intersection, nanosg.h:
    302-314): world t, barycentrics, mesh-local prim id, instance
    (node) id, world position and normals."""

    t: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    prim_id: jnp.ndarray
    node_id: jnp.ndarray
    position: jnp.ndarray  # (..., 3) world
    normal_g: jnp.ndarray  # (..., 3) world geometric
    normal_s: jnp.ndarray  # (..., 3) world shading

    @property
    def hit(self):
        return self.prim_id != jnp.uint32(INVALID_PRIM_ID)


class CommittedScene(NamedTuple):
    """Flattened device scene (pytree; static sizes live in packed)."""

    packed: object  # PackedScene (registered pytree)
    roots: jnp.ndarray  # (I,) per-instance bottom-level root row
    xform: jnp.ndarray  # (I, 4, 4)
    inv_xform: jnp.ndarray  # (I, 4, 4)
    inv_xform33: jnp.ndarray  # (I, 3, 3) direction transform
    inv_transpose33: jnp.ndarray  # (I, 3, 3) normal transform
    world_bmin: jnp.ndarray  # (I, 3)
    world_bmax: jnp.ndarray  # (I, 3)
    # concatenated per-mesh geometry for shading lookups
    vertices: jnp.ndarray  # (V, 3)
    faces: jnp.ndarray  # (F, 3) with vertex offsets applied
    face_offset: jnp.ndarray  # (I,) instance -> face-table offset
    normals: jnp.ndarray | None  # (F, 3, 3) facevarying shading normals


class Scene:
    """Reference nanosg::Scene<T, M> (nanosg.h:664-905)."""

    def __init__(self):
        self.root = Node("<root>")
        self._committed: CommittedScene | None = None
        self._flat_nodes: list[tuple[Node, np.ndarray]] = []
        # per-mesh build cache (reference semantics: a node's BVH is
        # built lazily ONCE, nanosg.h:409-411; transform edits only
        # recompose matrices). Keyed by mesh identity + build options;
        # holds the mesh ref so a recycled id() can never alias.
        self._build_cache: dict = {}
        self._pack_cache: tuple | None = None

    def add_node(self, node: Node):
        self.root.add_child(node)
        return node

    def find_node(self, name: str) -> Node | None:
        """Recursive name lookup (reference FindNode, nanosg.h:764-777)."""

        def rec(n):
            if n.name == name:
                return n
            for c in n.children:
                r = rec(c)
                if r is not None:
                    return r
            return None

        return rec(self.root)

    def commit(
        self,
        build_options: BVHBuildOptions = BVHBuildOptions(),
        mesh_normals: dict | None = None,
    ) -> CommittedScene:
        """Flatten + build. ``mesh_normals`` optionally maps id(mesh) ->
        (F, 3, 3) facevarying normals."""
        from .. import build_triangle_bvh

        # walk hierarchy composing transforms; collect mesh instances
        instances: list[tuple[Node, np.ndarray]] = []

        def walk(node, parent_xform):
            xf = parent_xform @ node.local_xform
            if node.mesh is not None:
                instances.append((node, xf))
            for c in node.children:
                walk(c, xf)

        walk(self.root, mat.identity())
        if not instances:
            raise ValueError("empty scene (reference Commit returns false)")
        self._flat_nodes = instances

        # unique meshes -> one BVH each
        mesh_key = {}
        unique = []
        for node, _ in instances:
            k = id(node.mesh)
            if k not in mesh_key:
                mesh_key[k] = len(unique)
                unique.append(node.mesh)
        built = []
        v_off, f_off = 0, 0
        mesh_face_off, cat_v, cat_f, cat_n = [], [], [], []
        for m in unique:
            v = np.asarray(m.vertices, np.float32)
            f = np.asarray(m.faces, np.int64)
            # build-once cache: a transform-only re-commit (interactive
            # gizmo edits) must not rebuild unchanged meshes
            hit = self._build_cache.get(id(m))
            if hit is not None and hit[0] is m and hit[1] == build_options:
                bvh = hit[2]
            else:
                bvh, _ = build_triangle_bvh(m, build_options)
                self._build_cache[id(m)] = (m, build_options, bvh)
            built.append((bvh, v, np.asarray(m.faces)))
            mesh_face_off.append(f_off)
            cat_v.append(v)
            cat_f.append(f + v_off)
            if mesh_normals and id(m) in mesh_normals:
                cat_n.append(np.asarray(mesh_normals[id(m)], np.float32))
            else:
                cat_n.append(None)
            v_off += v.shape[0]
            f_off += f.shape[0]

        # pack-once cache: the concatenated device tables depend only on
        # the unique-mesh list (+normals), not on instance transforms
        pack_key = tuple(id(m) for m in unique)
        if mesh_normals:
            pack_key = None  # caller-supplied normals: don't cache
        pc = self._pack_cache
        if pack_key is not None and pc is not None and pc[0] == pack_key:
            packed, mesh_roots, vertices_d, faces_d, normals = pc[1]
        else:
            packed, mesh_roots = pack_scene_multi(built)
            has_normals = any(n is not None for n in cat_n)
            if has_normals:
                cat_nf = [
                    n if n is not None
                    else np.zeros((fc.shape[0], 3, 3), np.float32)
                    for n, fc in zip(cat_n, cat_f)
                ]
                normals = jnp.asarray(np.concatenate(cat_nf))
            else:
                normals = None
            vertices_d = jnp.asarray(np.concatenate(cat_v))
            faces_d = jnp.asarray(np.concatenate(cat_f), jnp.int32)
            if pack_key is not None:
                self._pack_cache = (
                    pack_key,
                    (packed, mesh_roots, vertices_d, faces_d, normals),
                )

        xf, ixf, ixf33, it33, wlo, whi, roots, foffs = (
            [], [], [], [], [], [], [], []
        )
        for node, x in instances:
            mid = mesh_key[id(node.mesh)]
            inv = mat.inverse(x)
            xf.append(x)
            ixf.append(inv)
            ixf33.append(inv[:3, :3])
            it33.append(mat.inv_transpose33(x))
            bvh = built[mid][0]
            lo, hi = mat.xform_bbox(x, bvh.bmin[0], bvh.bmax[0])
            wlo.append(lo)
            whi.append(hi)
            roots.append(mesh_roots[mid])
            foffs.append(mesh_face_off[mid])

        self._committed = CommittedScene(
            packed=packed,
            roots=jnp.asarray(np.asarray(roots, np.int32)),
            xform=jnp.asarray(np.stack(xf), jnp.float32),
            inv_xform=jnp.asarray(np.stack(ixf), jnp.float32),
            inv_xform33=jnp.asarray(np.stack(ixf33), jnp.float32),
            inv_transpose33=jnp.asarray(np.stack(it33), jnp.float32),
            world_bmin=jnp.asarray(np.stack(wlo), jnp.float32),
            world_bmax=jnp.asarray(np.stack(whi), jnp.float32),
            vertices=vertices_d,
            faces=faces_d,
            face_offset=jnp.asarray(np.asarray(foffs, np.int32)),
            normals=normals,
        )
        return self._committed

    @property
    def committed(self) -> CommittedScene:
        if self._committed is None:
            raise RuntimeError("call commit() first (nanosg.h:706)")
        return self._committed

    def bounding_box(self):
        """World bounds of the whole scene (reference GetBoundingBox,
        nanosg.h:882-905)."""
        cs = self.committed
        return (
            np.asarray(cs.world_bmin).min(axis=0),
            np.asarray(cs.world_bmax).max(axis=0),
        )

    def traverse(self, rays: Rays, options: BVHTraceOptions = BVHTraceOptions(),
                 max_intersections: int = 64, tile: int = 8192) -> SceneHits:
        return scene_traverse(
            self.committed, rays, options, max_intersections, tile
        )


@functools.partial(
    jax.jit,
    static_argnames=("options", "max_intersections", "tile", "has_normals"),
)
def _scene_traverse_impl(
    cs: CommittedScene,
    rays: Rays,
    options: BVHTraceOptions,
    max_intersections: int,
    tile: int,
    has_normals: bool,
):
    bs = rays.batch_shape
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[len(bs):]), rays
    )
    R = flat.org.shape[0]
    n_inst = cs.roots.shape[0]
    f32 = jnp.float32

    inv_dir = safe_inverse(flat.dir)
    box_hit, tmin, _ = intersect_ray_aabb(
        cs.world_bmin[None, :, :],
        cs.world_bmax[None, :, :],
        flat.org[:, None, :],
        inv_dir[:, None, :],
        (flat.dir < 0)[:, None, :],
        flat.min_t[:, None],
        flat.max_t[:, None],
    )  # (R, I)
    big = jnp.array(jnp.finfo(f32).max, f32)
    key = jnp.where(box_hit, tmin, big)
    K = min(max_intersections, n_inst)
    order = jnp.argsort(key, axis=1)[:, :K]  # nearest-first (nanosg.h:792)

    t0 = flat.max_t
    zero3 = jnp.zeros((R, 3), f32)
    state = (
        t0,
        jnp.zeros((R,), f32),
        jnp.zeros((R,), f32),
        jnp.full((R,), INVALID_PRIM_ID, jnp.uint32),
        jnp.full((R,), INVALID_PRIM_ID, jnp.uint32),
        zero3,
        zero3,
        zero3,
    )

    def visit(k, st):
        t_best, u_b, v_b, pid_b, nid_b, p_b, ng_b, ns_b = st
        nid = jnp.take_along_axis(order, jnp.full((R, 1), k), axis=1)[:, 0]
        tmin_k = jnp.take_along_axis(key, nid[:, None], axis=1)[:, 0]
        # early cull (nanosg.h:805): skip when nearest < candidate entry
        active = (tmin_k < big) & ~(t_best < tmin_k)

        ixf = jnp.take(cs.inv_xform, nid, axis=0)
        ixf33 = jnp.take(cs.inv_xform33, nid, axis=0)
        l_org = mat.transform_points(ixf, flat.org)
        l_dir = mat.transform_dirs(ixf33, flat.dir)
        l_rays = Rays(
            org=l_org,
            dir=l_dir,
            min_t=jnp.zeros((R,), f32),
            max_t=jnp.where(active, big, f32(0.0)),
        )
        roots_k = jnp.take(cs.roots, nid)
        hits = traverse_wavefront(
            cs.packed, l_rays, options, tile=tile, root=roots_k
        )
        got = hits.hit & active

        l_p = l_org + hits.t[:, None] * l_dir
        xfk = jnp.take(cs.xform, nid, axis=0)
        w_p = mat.transform_points(xfk, l_p)
        t_world = jnp.linalg.norm(w_p - flat.org, axis=-1)
        # honor world-space t window (deviation: reference ignores it)
        upd = got & (t_world < t_best) & (t_world >= flat.min_t)

        fid = (jnp.take(cs.face_offset, nid) + hits.prim_id.astype(jnp.int32))
        fid = jnp.where(got, fid, 0)
        fverts = jnp.take(cs.faces, fid, axis=0)
        tri = jnp.take(cs.vertices, fverts, axis=0)
        ng_l = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        if has_normals:
            n3 = jnp.take(cs.normals, fid, axis=0)
            w0 = (1.0 - hits.u - hits.v)[:, None]
            ns_l = (
                w0 * n3[:, 0]
                + hits.u[:, None] * n3[:, 1]
                + hits.v[:, None] * n3[:, 2]
            )
        else:
            ns_l = ng_l
        it33 = jnp.take(cs.inv_transpose33, nid, axis=0)
        ng_w = normalize(mat.transform_dirs(it33, ng_l))
        ns_w = normalize(mat.transform_dirs(it33, ns_l))

        sel = upd[:, None]
        return (
            jnp.where(upd, t_world, t_best),
            jnp.where(upd, hits.u, u_b),
            jnp.where(upd, hits.v, v_b),
            jnp.where(upd, hits.prim_id, pid_b),
            jnp.where(upd, nid.astype(jnp.uint32), nid_b),
            jnp.where(sel, w_p, p_b),
            jnp.where(sel, ng_w, ng_b),
            jnp.where(sel, ns_w, ns_b),
        )

    t, u, v, pid, nid, p, ng, ns = jax.lax.fori_loop(0, K, visit, state)
    hit = t < flat.max_t
    miss_u32 = jnp.uint32(INVALID_PRIM_ID)
    out = SceneHits(
        t=t,
        u=jnp.where(hit, u, 0.0),
        v=jnp.where(hit, v, 0.0),
        prim_id=jnp.where(hit, pid, miss_u32),
        node_id=jnp.where(hit, nid, miss_u32),
        position=jnp.where(hit[:, None], p, 0.0),
        normal_g=jnp.where(hit[:, None], ng, 0.0),
        normal_s=jnp.where(hit[:, None], ns, 0.0),
    )
    reshape = lambda x: x.reshape(bs + x.shape[1:])
    return jax.tree_util.tree_map(reshape, out)


def scene_traverse(
    cs: CommittedScene,
    rays: Rays,
    options: BVHTraceOptions = BVHTraceOptions(),
    max_intersections: int = 64,
    tile: int = 8192,
) -> SceneHits:
    return _scene_traverse_impl(
        cs, rays, options, max_intersections, tile, cs.normals is not None
    )

"""Embree-style front-end API (reference examples/embree-api/).

The reference ships an Embree-2 C API shim backed by NanoSG
(nanort-embree.cc:454-693). This is the same surface re-expressed as a
Python API over the TPU scene graph, preserving the object model and
call sequence an Embree user expects:

  device = new_device()                       # rtcNewDevice
  scene = device.new_scene()                  # rtcDeviceNewScene
  gid = scene.new_triangle_mesh(n_tris, n_v)  # rtcNewTriangleMesh
  scene.map_buffer(gid, VERTEX)[:] = ...      # rtcMapBuffer/rtcUnmapBuffer
  scene.commit()                              # rtcCommit
  hits = scene.intersect(rays)                # rtcIntersect (batched!)
  occluded = scene.occluded(rays)             # rtcOccluded
  lo, hi = scene.bounds()                     # rtcGetBounds

Differences from the C shim, by design:
* intersect/occluded take Rays *batches* (the whole point of the TPU port;
  the reference shim is explicitly single-ray and not thread-safe).
* geometry ids come from a free-list allocator like the reference's
  HandleAllocator (nanort-embree.cc:210-254).
* errors raise instead of accumulating an error string on the device
  (the reference stores them on the Context, nanort-embree.cc:430).
"""

from __future__ import annotations

import enum

import numpy as np
import jax.numpy as jnp

from ..core.options import BVHBuildOptions, BVHTraceOptions, INVALID_PRIM_ID
from ..core.ray import Rays
from ..ops.triangle import TriangleMesh
from ..scene import matrix as mat
from ..scene.graph import Node, Scene as _SG


class BufferType(enum.Enum):
    """Subset of RTCBufferType the reference shim supports
    (rtcMapBuffer, nanort-embree.cc:598-634)."""

    VERTEX = 0
    INDEX = 1


class _Geometry:
    def __init__(self, num_triangles: int, num_vertices: int):
        # Embree uses 16-byte vertex strides (nanort-embree.cc:149-154);
        # here buffers are plain (n, 3) arrays
        self.vertices = np.zeros((num_vertices, 3), np.float32)
        self.indices = np.zeros((num_triangles, 3), np.int32)
        self.xform = mat.identity()
        self.enabled = True


class RTCScene:
    def __init__(self, device: "RTCDevice"):
        self._device = device
        self._geoms: dict[int, _Geometry] = {}
        self._free_ids: list[int] = []
        self._next_id = 0
        self._sg: _SG | None = None
        self._committed = False

    # -- geometry management (rtcNewTriangleMesh, rtcDeleteGeometry) --
    def new_triangle_mesh(self, num_triangles: int, num_vertices: int) -> int:
        gid = self._free_ids.pop() if self._free_ids else self._next_id
        if gid == self._next_id:
            self._next_id += 1
        self._geoms[gid] = _Geometry(num_triangles, num_vertices)
        self._committed = False
        return gid

    def delete_geometry(self, geom_id: int):
        del self._geoms[geom_id]
        self._free_ids.append(geom_id)
        self._committed = False

    def map_buffer(self, geom_id: int, kind: BufferType) -> np.ndarray:
        """Returns the writable host buffer (map/unmap collapse into one
        call; the reference's rtcUnmapBuffer is a no-op too)."""
        g = self._geoms[geom_id]
        self._committed = False
        return g.vertices if kind == BufferType.VERTEX else g.indices

    def set_transform(self, geom_id: int, xform):
        """rtcSetTransform2 (a stub in the reference shim; functional
        here via the scene graph)."""
        self._geoms[geom_id].xform = np.asarray(xform, np.float64)
        self._committed = False

    # -- commit & query --
    def commit(
        self,
        options: BVHBuildOptions = BVHBuildOptions(),
        fast: bool | None = None,
    ):
        """rtcCommit -> Scene::Commit (nanort-embree.cc:688-693).

        ``fast`` additionally builds BVH8 packet-kernel tables so
        ``occluded`` runs the any-hit Pallas kernel: all geometries with
        identity transforms are flattened into one concatenated mesh
        (matching the committed scene exactly — world == local space).
        Default (None): enabled on TPU, disabled on CPU (the packet
        kernel is TPU-only). Scenes with non-identity transforms fall
        back to the scene-graph traversal."""
        if not self._geoms:
            raise ValueError("rtcCommit on empty scene")
        sg = _SG()
        self._node_of = {}
        for gid in sorted(self._geoms):
            g = self._geoms[gid]
            mesh = TriangleMesh(
                vertices=jnp.asarray(g.vertices), faces=jnp.asarray(g.indices)
            )
            sg.add_node(Node(f"geom{gid}", mesh, g.xform))
            self._node_of[len(self._node_of)] = gid
        sg.commit(options)
        self._sg = sg
        self._scene8 = None
        self._flat_pack = None
        if fast is None:
            import jax

            fast = jax.default_backend() != "cpu"
        total_tris = sum(len(g.indices) for g in self._geoms.values())
        if fast and 0 < total_tris <= (1 << 24):
            from .. import build_triangle_bvh
            from ..build.bvh8 import collapse_bvh8

            # flatten all geometries into one world-space mesh, baking
            # each geometry's transform into its vertices — occluded()
            # is a per-ray boolean, so a single world-space BVH over the
            # transformed union is exactly the committed scene (no
            # instance-id bookkeeping needed on this path)
            v_parts, f_parts, v_off = [], [], 0
            for gid in sorted(self._geoms):
                g = self._geoms[gid]
                vg = np.asarray(g.vertices, np.float32)
                x = np.asarray(g.xform, np.float32)
                if not np.allclose(x, mat.identity()):
                    vg = vg @ x[:3, :3].T + x[:3, 3]
                v_parts.append(vg)
                f_parts.append(np.asarray(g.indices, np.int64) + v_off)
                v_off += len(g.vertices)
            flat_v = np.concatenate(v_parts)
            flat_f = np.concatenate(f_parts)
            opt8 = BVHBuildOptions(
                min_leaf_primitives=8, max_leaf_primitives=8
            )
            bvh8_src, _ = build_triangle_bvh(
                TriangleMesh(
                    vertices=jnp.asarray(flat_v), faces=jnp.asarray(flat_f)
                ),
                opt8,
            )
            self._scene8 = collapse_bvh8(bvh8_src, flat_v, flat_f)
            # flat-prim-id -> (geom id, local prim) remap tables + the
            # world-space mesh, for the fast closest-hit path
            gids = sorted(self._geoms)
            tri_counts = [len(self._geoms[g].indices) for g in gids]
            offs = np.zeros(len(gids), np.int32)
            np.cumsum(tri_counts[:-1], out=offs[1:])
            self._flat_pack = (
                jnp.asarray(flat_v),
                jnp.asarray(flat_f, jnp.int32),
                jnp.asarray(offs),
                jnp.asarray(np.asarray(gids, np.uint32)),
            )
        self._committed = True

    def bounds(self):
        """rtcGetBounds (nanort-embree.cc:471-498)."""
        self._check()
        return self._sg.bounding_box()

    def intersect(self, rays: Rays, cull_back_face: bool = False):
        """rtcIntersect over a ray batch. Returns a SceneHits whose
        node_id maps back to geometry ids via geom_ids().

        When commit() built the fast tables, closest-hit runs through
        the Morton-sorted Pallas packet kernel over the flattened
        world-space mesh (reference rtcIntersect wraps the two-level
        NanoSG walk, nanort-embree.cc:515-554 — here one world-space BVH
        is exactly the committed scene since transforms are baked at
        commit; for non-identity transforms t/u/v may differ at ulp
        level from the local-space walk the reference performs)."""
        self._check()
        opt = BVHTraceOptions(cull_back_face=cull_back_face)
        if self._scene8 is not None:
            return self._intersect_fast(rays, opt)
        hits = self._sg.traverse(rays, opt)
        # remap instance index -> geometry id
        lut = np.full(max(self._node_of) + 2, INVALID_PRIM_ID, np.uint32)
        for inst, gid in self._node_of.items():
            lut[inst] = gid
        geom = jnp.take(
            jnp.asarray(lut),
            jnp.minimum(hits.node_id, len(lut) - 1).astype(jnp.int32),
        )
        geom = jnp.where(hits.hit, geom, jnp.uint32(INVALID_PRIM_ID))
        return hits._replace(node_id=geom)

    def _intersect_fast(self, rays: Rays, opt: BVHTraceOptions):
        from ..core.math import normalize
        from ..scene.graph import SceneHits
        from ..traverse.ray_sort import traverse_bvh8_sorted

        h = traverse_bvh8_sorted(self._scene8, rays, opt)
        flat_v, flat_f, offs, gid_arr = self._flat_pack
        hit = h.prim_id != jnp.uint32(INVALID_PRIM_ID)
        pid = jnp.where(hit, h.prim_id, 0).astype(jnp.int32)
        gi = (
            jnp.searchsorted(offs, pid, side="right").astype(jnp.int32) - 1
        )
        miss = jnp.uint32(INVALID_PRIM_ID)
        geom = jnp.where(hit, jnp.take(gid_arr, gi), miss)
        local = jnp.where(
            hit, (pid - jnp.take(offs, gi)).astype(jnp.uint32), miss
        )
        pos = rays.org + h.t[..., None] * rays.dir
        tri = jnp.take(flat_v, jnp.take(flat_f, pid, axis=0), axis=0)
        ng = normalize(jnp.cross(
            tri[..., 1, :] - tri[..., 0, :], tri[..., 2, :] - tri[..., 0, :]
        ))
        h3 = hit[..., None]
        zero3 = jnp.zeros_like(pos)
        return SceneHits(
            t=h.t,
            u=h.u,
            v=h.v,
            prim_id=local,
            node_id=geom,
            position=jnp.where(h3, pos, zero3),
            normal_g=jnp.where(h3, ng, zero3),
            normal_s=jnp.where(h3, ng, zero3),
        )

    def occluded(self, rays: Rays) -> jnp.ndarray:
        """rtcOccluded: boolean any-hit per ray. Uses the sorted
        packet kernel's occlusion mode when commit() built the fast
        tables (rays terminate at their first hit)."""
        self._check()
        if self._scene8 is not None:
            from ..traverse.ray_sort import traverse_bvh8_sorted

            return traverse_bvh8_sorted(
                self._scene8, rays, occlusion=True
            ).hit
        return self._sg.traverse(rays).hit

    def _check(self):
        if not self._committed:
            raise RuntimeError("scene not committed (call commit())")


class RTCDevice:
    """rtcNewDevice; owns scenes (nanort-embree.cc:146-207)."""

    def __init__(self, config: str | None = None):
        self.config = config
        self._scenes: list[RTCScene] = []

    def new_scene(self) -> RTCScene:
        s = RTCScene(self)
        self._scenes.append(s)
        return s


def new_device(config: str | None = None) -> RTCDevice:
    return RTCDevice(config)

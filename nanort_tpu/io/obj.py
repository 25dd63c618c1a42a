"""Minimal Wavefront OBJ loader (host side).

The reference vendors tinyobjloader (examples/common/tiny_obj_loader.h)
and converts shapes into a facevarying Mesh (examples/common/obj-loader.cc,
path_tracer/main.cc:457-640). This is a dependency-free loader covering
the subset those examples consume: v / vn / vt / f (with polygon fan
triangulation and negative indices), usemtl / mtllib with newmtl, Kd, Ke,
Ks, Tf/Kt, Ni, d (dissolve).

Returns SoA numpy arrays ready for TriangleMesh / MeshAttributes /
path-tracer Materials.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np


class ObjMesh(NamedTuple):
    vertices: np.ndarray  # (V, 3) f32
    faces: np.ndarray  # (F, 3) i32
    facevarying_normals: np.ndarray | None  # (F, 3, 3)
    facevarying_uvs: np.ndarray | None  # (F, 3, 2)
    material_ids: np.ndarray  # (F,) i32 (-1 = none)
    materials: dict  # path-tracer material arrays


def _default_material():
    return dict(
        diffuse=[0.7, 0.7, 0.7],
        emission=[0.0, 0.0, 0.0],
        specular=[0.0, 0.0, 0.0],
        transmittance=[0.0, 0.0, 0.0],
        ior=1.0,
        dissolve=0.0,
    )


def load_mtl(path: str) -> dict:
    """Parse a .mtl file into {name: material fields}."""
    mats = {}
    cur = None
    if not os.path.exists(path):
        return mats
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok or tok[0].startswith("#"):
                continue
            k = tok[0]
            if k == "newmtl":
                cur = _default_material()
                mats[tok[1]] = cur
            elif cur is None:
                continue
            elif k == "Kd":
                cur["diffuse"] = [float(x) for x in tok[1:4]]
            elif k == "Ke":
                cur["emission"] = [float(x) for x in tok[1:4]]
            elif k == "Ks":
                cur["specular"] = [float(x) for x in tok[1:4]]
            elif k in ("Tf", "Kt"):
                cur["transmittance"] = [float(x) for x in tok[1:4]]
            elif k == "Ni":
                cur["ior"] = float(tok[1])
            elif k == "d":
                cur["dissolve"] = 1.0 - float(tok[1])  # d=1 opaque
            elif k == "Tr":
                cur["dissolve"] = float(tok[1])
    return mats


def load_obj(path: str) -> ObjMesh:
    vs, vns, vts = [], [], []
    faces, fn_idx, ft_idx, fmat = [], [], [], []
    mtl_map: dict = {}
    mtl_names: list[str] = []
    cur_mat = -1

    def mat_index(name):
        if name not in mtl_names:
            mtl_names.append(name)
        return mtl_names.index(name)

    def parse_vert(tok):
        # v, v/t, v//n, v/t/n with 1-based or negative indices
        parts = tok.split("/")
        vi = int(parts[0])
        ti = int(parts[1]) if len(parts) > 1 and parts[1] else 0
        ni = int(parts[2]) if len(parts) > 2 and parts[2] else 0
        fix = lambda i, n: (i - 1) if i > 0 else (n + i if i < 0 else -1)
        return fix(vi, len(vs)), fix(ti, len(vts)), fix(ni, len(vns))

    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok or tok[0].startswith("#"):
                continue
            k = tok[0]
            if k == "v":
                vs.append([float(x) for x in tok[1:4]])
            elif k == "vn":
                vns.append([float(x) for x in tok[1:4]])
            elif k == "vt":
                vts.append([float(x) for x in tok[1:3]])
            elif k == "mtllib":
                mtl_map.update(
                    load_mtl(os.path.join(os.path.dirname(path), tok[1]))
                )
            elif k == "usemtl":
                cur_mat = mat_index(tok[1])
            elif k == "f":
                idx = [parse_vert(t) for t in tok[1:]]
                for i in range(1, len(idx) - 1):  # fan triangulation
                    tri = (idx[0], idx[i], idx[i + 1])
                    faces.append([t[0] for t in tri])
                    ft_idx.append([t[1] for t in tri])
                    fn_idx.append([t[2] for t in tri])
                    fmat.append(cur_mat)

    vertices = np.asarray(vs, np.float32)
    faces_a = np.asarray(faces, np.int32)
    nrm = None
    if vns and all(all(i >= 0 for i in f3) for f3 in fn_idx):
        vn = np.asarray(vns, np.float32)
        nrm = vn[np.asarray(fn_idx, np.int64)]
    uv = None
    if vts and all(all(i >= 0 for i in f3) for f3 in ft_idx):
        vt = np.asarray(vts, np.float32)
        uv = vt[np.asarray(ft_idx, np.int64)]

    # material table in file order; unknown names get defaults
    mats = [mtl_map.get(n, _default_material()) for n in mtl_names]
    if not mats:
        mats = [_default_material()]
    materials = dict(
        diffuse=np.asarray([m["diffuse"] for m in mats], np.float32),
        emission=np.asarray([m["emission"] for m in mats], np.float32),
        specular=np.asarray([m["specular"] for m in mats], np.float32),
        transmittance=np.asarray(
            [m["transmittance"] for m in mats], np.float32
        ),
        ior=np.asarray([m["ior"] for m in mats], np.float32),
        dissolve=np.asarray([m["dissolve"] for m in mats], np.float32),
    )
    material_ids = np.asarray(fmat, np.int32)
    material_ids[material_ids < 0] = 0
    return ObjMesh(
        vertices=vertices,
        faces=faces_a,
        facevarying_normals=nrm,
        facevarying_uvs=uv,
        material_ids=material_ids,
        materials=materials,
    )


def save_obj(path: str, vertices, faces) -> None:
    """Write a plain v/f OBJ (test round-trips, scene export)."""
    with open(path, "w") as f:
        for v in np.asarray(vertices):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in np.asarray(faces):
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")

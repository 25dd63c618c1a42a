"""Minimal glTF 2.0 loader: .gltf+bin, .glb, TRS hierarchy, instancing."""

import base64
import json
import struct

import numpy as np

from nanort_tpu import make_rays
from nanort_tpu.io.gltf import load_gltf, to_scene_graph


def _tri_gltf_doc():
    # one triangle (0,0,0),(1,0,0),(0,1,0), u16 indices
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    buf = pos.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(buf)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {"baseColorFactor": [1, 0, 0, 1]},
                       "emissiveFactor": [0, 0, 2]}],
        "nodes": [
            {"mesh": 0, "name": "a"},
            {"mesh": 0, "name": "b", "translation": [3, 0, 0], "scale": [2, 2, 2]},
        ],
        "scenes": [{"nodes": [0, 1]}],
        "scene": 0,
    }
    return doc, buf


def test_gltf_json_with_data_uri(tmp_path):
    doc, buf = _tri_gltf_doc()
    doc["buffers"][0]["uri"] = (
        "data:application/octet-stream;base64," + base64.b64encode(buf).decode()
    )
    p = tmp_path / "t.gltf"
    p.write_text(json.dumps(doc))
    g = load_gltf(str(p))
    assert len(g.meshes) == 1 and len(g.instances) == 2
    np.testing.assert_array_equal(g.meshes[0].faces, [[0, 1, 2]])
    np.testing.assert_allclose(g.materials["diffuse"][0], [1, 0, 0])
    np.testing.assert_allclose(g.materials["emission"][0], [0, 0, 2])
    # instance b carries translation+scale
    xf = g.instances[1][1]
    np.testing.assert_allclose(xf[:3, 3], [3, 0, 0])
    np.testing.assert_allclose(np.diag(xf)[:3], [2, 2, 2])


def test_glb_and_trace(tmp_path):
    doc, buf = _tri_gltf_doc()
    js = json.dumps(doc).encode()
    js += b" " * (-len(js) % 4)
    bin_pad = buf + b"\0" * (-len(buf) % 4)
    glb = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(bin_pad))
    glb += struct.pack("<II", len(js), 0x4E4F534A) + js
    glb += struct.pack("<II", len(bin_pad), 0x004E4942) + bin_pad
    p = tmp_path / "t.glb"
    p.write_bytes(glb)
    g = load_gltf(str(p))
    sc = to_scene_graph(g)
    sc.commit()
    # instance a at origin, instance b scaled x2 at x=3
    rays = make_rays(
        np.array([[0.2, 0.2, 5], [3.4, 0.4, 5], [2.0, 0.2, 5]], np.float32),
        np.tile([0, 0, -1.0], (3, 1)).astype(np.float32),
    )
    h = sc.traverse(rays)
    hits = np.asarray(h.hit)
    assert hits[0] and hits[1] and not hits[2]
    assert int(h.node_id[0]) == 0 and int(h.node_id[1]) == 1

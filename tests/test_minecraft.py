"""Minecraft region loader (enkiMI equivalent): NBT + .mca parsing for
both the legacy Blocks and flattened BlockStates schemas, then
voxels -> mesh -> raytrace."""

import struct
import zlib

import numpy as np

from nanort_tpu.io.minecraft import (
    load_region_mesh,
    parse_nbt,
    read_region,
    region_to_voxels,
)


# ---- minimal NBT writer (test-side oracle) ----

def _w_str(s):
    b = s.encode()
    return struct.pack(">H", len(b)) + b


def _w_tag(value):
    """Return (tag_id, payload_bytes) for a python value."""
    if isinstance(value, bool):
        return 1, struct.pack(">b", int(value))
    if isinstance(value, int):
        return 3, struct.pack(">i", value)
    if isinstance(value, float):
        return 6, struct.pack(">d", value)
    if isinstance(value, str):
        return 8, _w_str(value)
    if isinstance(value, np.ndarray) and value.dtype == np.int8:
        return 7, struct.pack(">i", value.size) + value.tobytes()
    if isinstance(value, np.ndarray) and value.dtype == np.int64:
        return 12, struct.pack(">i", value.size) + value.astype(">i8").tobytes()
    if isinstance(value, list):
        if not value:
            return 9, struct.pack(">bi", 0, 0)
        etag, _ = _w_tag(value[0])
        body = b"".join(_w_tag(v)[1] for v in value)
        return 9, struct.pack(">bi", etag, len(value)) + body
    if isinstance(value, dict):
        body = b""
        for k, v in value.items():
            t, payload = _w_tag(v)
            body += struct.pack(">b", t) + _w_str(k) + payload
        return 10, body + b"\x00"
    raise TypeError(type(value))


def _nbt_blob(name, compound):
    t, payload = _w_tag(compound)
    return struct.pack(">b", t) + _w_str(name) + payload


def _mca(chunks):
    """chunks: list of (index, nbt_root_dict) -> region file bytes."""
    header = bytearray(8192)
    body = b""
    sector = 2
    for idx, root in chunks:
        blob = zlib.compress(_nbt_blob("", root))
        payload = struct.pack(">I", len(blob) + 1) + b"\x02" + blob
        pad = (-len(payload)) % 4096
        payload += b"\x00" * pad
        n_sec = len(payload) // 4096
        struct.pack_into(">I", header, idx * 4, (sector << 8) | n_sec)
        struct.pack_into(">I", header, 4096 + idx * 4, 12345)
        body += payload
        sector += n_sec
    return bytes(header) + body


def _legacy_chunk(xpos, zpos, blocks_yzx):
    return {
        "Level": {
            "xPos": xpos,
            "zPos": zpos,
            "Sections": [
                {"Y": np.int8(0).item(), "Blocks": blocks_yzx.astype(np.int8)}
            ],
        }
    }


def _flattened_chunk(xpos, zpos, idx_yzx, palette_names, bits):
    per_long = 64 // bits
    packed = np.zeros(-(-4096 // per_long), np.uint64)
    flat = idx_yzx.reshape(-1).astype(np.uint64)
    for i, v in enumerate(flat):
        packed[i // per_long] |= v << np.uint64((i % per_long) * bits)
    return {
        "Level": {
            "xPos": xpos,
            "zPos": zpos,
            "Sections": [
                {
                    "Y": 0,
                    "BlockStates": packed.astype(np.int64),
                    "Palette": [{"Name": n} for n in palette_names],
                }
            ],
        }
    }


def test_nbt_roundtrip():
    root = {
        "byte": True,
        "int": 42,
        "double": 1.5,
        "str": "hello",
        "arr": np.arange(8, dtype=np.int8),
        "longs": np.arange(3, dtype=np.int64),
        "list": [1, 2, 3],
        "nested": {"a": 1},
    }
    name, back = parse_nbt(_nbt_blob("root", root))
    assert name == "root"
    assert back["int"] == 42 and back["str"] == "hello"
    assert back["nested"]["a"] == 1
    np.testing.assert_array_equal(back["arr"], np.arange(8))
    assert back["list"] == [1, 2, 3]


def test_legacy_region_voxels():
    blocks = np.zeros((16, 16, 16), np.int8)  # [y, z, x]
    blocks[0, :, :] = 1  # a floor at y=0
    blocks[5, 3, 7] = 2  # one block at (x=7, y=5, z=3)
    data = _mca([(0, _legacy_chunk(0, 0, blocks))])
    chunks = read_region(data)
    assert len(chunks) == 1
    occ, origin = region_to_voxels(data)
    assert origin == (0, 0, 0)
    assert occ.shape == (16, 16, 16)
    assert occ[:, 0, :].all()  # floor
    assert occ[7, 5, 3] and occ.sum() == 256 + 1


def test_flattened_region_voxels_and_mesh():
    idx = np.zeros((16, 16, 16), np.int64)  # [y, z, x] palette indices
    idx[2, 4, 9] = 1
    idx[3, 4, 9] = 2  # air variant: must NOT be solid
    chunk = _flattened_chunk(1, -1, idx,
                             ["minecraft:air", "minecraft:stone",
                              "minecraft:cave_air"], bits=4)
    data = _mca([(0, chunk)])
    occ, origin = region_to_voxels(data)
    assert origin == (16, 0, -16)
    assert occ.sum() == 1 and occ[9, 2, 4]

    v, f = load_region_mesh(data)
    assert len(f) == 12  # one cube
    # the cube sits at world position (16+9, 2, -16+4)
    np.testing.assert_allclose(v.min(axis=0), [25, 2, -12])
    np.testing.assert_allclose(v.max(axis=0), [26, 3, -11])


def test_region_raytrace():
    import jax.numpy as jnp

    from nanort_tpu import build_triangle_bvh, make_rays, traverse_triangles
    from nanort_tpu.ops.triangle import TriangleMesh

    blocks = np.zeros((16, 16, 16), np.int8)
    blocks[0:3, :, :] = 1  # 3-high slab
    data = _mca([(0, _legacy_chunk(0, 0, blocks))])
    v, f = load_region_mesh(data)
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh)
    rays = make_rays(
        np.array([[8.5, 50.0, 8.5]], np.float32),
        np.array([[0, -1.0, 0]], np.float32),
    )
    h = traverse_triangles(bvh, mesh, rays)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 47.0, rtol=1e-6)  # top at y=3

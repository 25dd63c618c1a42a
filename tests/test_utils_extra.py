"""Trackball, EXR IO, vector displacement, debug dump."""

import numpy as np

from nanort_tpu.core.bvh import debug_dump
from nanort_tpu.io.displacement import (
    apply_vector_displacement,
    compute_tangent_frames,
    weld_vertices,
)
from nanort_tpu.utils.exr import load_exr, save_exr
from nanort_tpu.utils.trackball import (
    add_quats,
    build_rotmatrix,
    camera_from_quat,
    trackball,
)


def test_trackball_rotation():
    q = trackball(0.0, 0.0, 0.5, 0.0)  # horizontal drag
    m = build_rotmatrix(q)
    # proper rotation: orthonormal, det 1
    np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(m[:3, :3]) - 1) < 1e-12
    # no drag -> identity
    q0 = trackball(0.1, 0.1, 0.1, 0.1)
    np.testing.assert_allclose(q0, [0, 0, 0, 1])
    # composition stays unit
    q2 = add_quats(q, q)
    assert abs(np.linalg.norm(q2) - 1) < 1e-12


def test_camera_from_quat():
    cam = camera_from_quat([0, 0, 0, 1], [0, 0, 0], 5.0, 64, 64)
    np.testing.assert_allclose(np.asarray(cam.eye), [0, 0, 5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.w), [0, 0, 1], atol=1e-6)


def test_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(17, 23, 3)).astype(np.float32) * 10
    p = str(tmp_path / "t.exr")
    save_exr(p, img)
    back = load_exr(p)
    np.testing.assert_array_equal(back, img)  # lossless float32
    # magic spot check
    assert open(p, "rb").read(4) == bytes.fromhex("762f3101")


def test_vector_displacement():
    tri_pos = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    tri_uv = np.array([[[0, 0], [1, 0], [0, 1]]], np.float32)
    # constant map displacing along the normal channel only
    dmap = np.zeros((4, 4, 3), np.float32)
    dmap[:, :, 2] = 1.0
    out = apply_vector_displacement(tri_pos, tri_uv, dmap, scale=0.5)
    # face normal is +z: every vertex moves +0.5 z
    np.testing.assert_allclose(out[0, :, 2], 0.5, atol=1e-6)
    np.testing.assert_allclose(out[0, :, :2], tri_pos[0, :, :2], atol=1e-6)
    t, b, n = compute_tangent_frames(tri_pos, tri_uv)
    np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(t[0], [1, 0, 0], atol=1e-6)


def test_weld():
    tri = np.array(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0]],
         [[1, 0, 0], [1, 1, 0], [0, 1, 0]]], np.float32
    )
    v, f = weld_vertices(tri)
    assert v.shape == (4, 3) and f.shape == (2, 3)
    np.testing.assert_array_equal(v[f], tri)


def test_debug_dump():
    from nanort_tpu import build_triangle_bvh
    from nanort_tpu.io.procedural import make_uv_sphere
    from nanort_tpu.ops.triangle import TriangleMesh

    v, f = make_uv_sphere(6, 12)
    bvh, _ = build_triangle_bvh(TriangleMesh(vertices=v, faces=f))
    s = debug_dump(bvh, max_nodes=4)
    assert "node[0] branch" in s and "more" in s

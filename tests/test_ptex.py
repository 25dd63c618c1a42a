"""Per-face texturing (the reference's ptex example capability,
examples/ptex/ — external libPtex there; native here)."""

import numpy as np
import pytest

from nanort_tpu.io.ptex import (
    build_face_textures,
    load_ptex_npz,
    sample,
    sample_tri_hits,
    save_ptex_npz,
)


def _checker(ur, vr, c0, c1):
    t = np.zeros((ur, vr, 3), np.float32)
    xx, yy = np.meshgrid(np.arange(ur), np.arange(vr), indexing="ij")
    m = ((xx + yy) % 2 == 0)
    t[m] = c0
    t[~m] = c1
    return t


def test_build_and_sample_per_face_res():
    tex = build_face_textures([
        np.full((4, 4, 3), 0.25, np.float32),
        _checker(8, 2, [1, 0, 0], [0, 1, 0]),
        np.full((1, 1, 3), 0.75, np.float32),
    ])
    assert tex.num_faces == 3 and tex.texels.shape == (3, 8, 8, 3)
    # constant faces sample their constant anywhere
    out = sample(tex, np.array([0, 2]), np.array([0.3, 0.9]),
                 np.array([0.7, 0.1]))
    np.testing.assert_allclose(np.asarray(out),
                               [[0.25] * 3, [0.75] * 3], atol=1e-6)
    # texel centers of the checker reproduce exact colors
    out = sample(tex, np.array([1, 1]),
                 np.array([0.5 / 8, 1.5 / 8]),
                 np.array([0.25, 0.25]))
    np.testing.assert_allclose(np.asarray(out),
                               [[1, 0, 0], [0, 1, 0]], atol=1e-6)
    # invalid face -> zeros
    out = sample(tex, np.array([-1, 99]), np.array([0.5, 0.5]),
                 np.array([0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_bilinear_midpoint():
    t = np.zeros((2, 2, 1), np.float32)
    t[1, 1, 0] = 1.0
    tex = build_face_textures([t])
    # center of the face: average of the 4 texels = 0.25
    out = sample(tex, np.array([0]), np.array([0.5]), np.array([0.5]))
    np.testing.assert_allclose(float(out[0, 0]), 0.25, atol=1e-6)


def test_validation():
    with pytest.raises(ValueError):
        build_face_textures([])
    with pytest.raises(ValueError):
        build_face_textures([np.zeros((3, 4, 3), np.float32)])  # not pow2
    with pytest.raises(ValueError):
        build_face_textures([
            np.zeros((2, 2, 3), np.float32),
            np.zeros((2, 2, 1), np.float32),
        ])


def test_container_roundtrip(tmp_path):
    tex = build_face_textures([_checker(4, 4, [1, 1, 0], [0, 0, 1])])
    p = str(tmp_path / "t.ntpx")
    save_ptex_npz(p, tex)
    back = load_ptex_npz(p)
    np.testing.assert_array_equal(np.asarray(back.texels),
                                  np.asarray(tex.texels))
    with pytest.raises(ValueError):
        (tmp_path / "bad").write_bytes(b"nope")
        load_ptex_npz(str(tmp_path / "bad"))


def test_quad_hits_shading():
    """Raytrace a unit quad (two tris) textured with one ptex face; the
    image must reproduce the checker in quad parameter space."""
    import jax.numpy as jnp

    from nanort_tpu import build_triangle_bvh, make_rays, traverse_triangles
    from nanort_tpu.ops.triangle import TriangleMesh

    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)  # one quad, two tris
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh)

    tex = build_face_textures([_checker(8, 8, [1, 0, 0], [0, 0, 1])])
    n = 8
    xs = (np.arange(n) + 0.5) / n  # exactly the 8x8 texel centers
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    org = np.stack([gx, gy, np.ones_like(gx)], -1).reshape(-1, 3)
    dirs = np.tile([0, 0, -1.0], (n * n, 1)).astype(np.float32)
    hits = traverse_triangles(bvh, mesh, make_rays(org, dirs))
    assert np.asarray(hits.hit).all()
    rgb = np.asarray(sample_tri_hits(tex, hits, quad_faces=True))
    rgb = rgb.reshape(n, n, 3)
    # world (x, y) IS the quad param here, so the image must reproduce
    # the checker exactly at texel centers — across BOTH triangles
    want = np.asarray(_checker(8, 8, [1, 0, 0], [0, 0, 1]))
    np.testing.assert_allclose(rgb, want, atol=1e-5)

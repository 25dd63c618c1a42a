"""LAS round-trip + sphere rendering; heightmap meshing."""

import numpy as np

from nanort_tpu import make_rays
from nanort_tpu.io.heightmap import heightmap_to_mesh
from nanort_tpu.io.las import load_las, save_las, to_spheres
from nanort_tpu.ops.sphere import build_sphere_bvh, traverse_spheres


def test_las_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (500, 3))
    inten = rng.uniform(0, 1, 500)
    p = str(tmp_path / "cloud.las")
    save_las(p, pts, inten)
    c = load_las(p)
    assert c.points.shape == (500, 3)
    np.testing.assert_allclose(c.points, pts, atol=1e-4)
    np.testing.assert_allclose(c.intensity, inten, atol=1e-3)


def test_las_to_spheres_render(tmp_path):
    pts = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float64)
    p = str(tmp_path / "c.las")
    save_las(p, pts)
    s = to_spheres(load_las(p), radius=0.3)
    bvh, _ = build_sphere_bvh(s)
    rays = make_rays(
        np.array([[0, 0, 5], [2, 0, 5], [1, 1, 5]], np.float32),
        np.tile([0, 0, -1.0], (3, 1)).astype(np.float32),
    )
    h = traverse_spheres(bvh, s, rays)
    hits = np.asarray(h.hit)
    assert hits[0] and hits[1] and not hits[2]


def test_heightmap_mesh():
    h = np.zeros((4, 5), np.float32)
    h[2, 2] = 1.0
    v, f = heightmap_to_mesh(h, scale_xy=1.0, scale_z=2.0)
    assert v.shape == (20, 3) and f.shape == (24, 3)
    assert v[:, 1].max() == 2.0  # peak scaled
    # threshold drops flat cells
    v2, f2 = heightmap_to_mesh(h, threshold=0.2)
    assert 0 < len(f2) < 24

"""Camera model tests: all 7 reference camera types generate sane rays."""

import numpy as np
import pytest

from nanort_tpu import build_triangle_bvh, traverse_triangles
from nanort_tpu.io.procedural import make_cornell_box, make_uv_sphere, merge_meshes
from nanort_tpu.models.cameras import (
    CAMERA_REGISTRY,
    generate_rays,
    look_at,
    orthographic_rays,
    pinhole_rays,
)
from nanort_tpu.ops.triangle import TriangleMesh


@pytest.fixture(scope="module")
def scene():
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(10, 20, 0.5))
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(mesh)
    return bvh, mesh


@pytest.mark.parametrize("name", list(CAMERA_REGISTRY))
def test_all_cameras_hit_scene(scene, name):
    bvh, mesh = scene
    cam = look_at(eye=(0, 0, 2.4), center=(0, 0, 0), width=32, height=32, fov=60)
    rays = generate_rays(cam, name)
    assert rays.org.shape == (32, 32, 3)
    d = np.asarray(rays.dir)
    # directions unit-ish (fisheye out-of-range lanes are zero by design)
    n = np.linalg.norm(d, axis=-1)
    assert ((np.abs(n - 1.0) < 1e-4) | (n == 0)).all()
    hits = traverse_triangles(bvh, mesh, rays)
    frac = float(np.asarray(hits.hit).mean())
    assert frac > 0.05, f"{name} camera sees nothing (hit {frac})"


def test_orthographic_axis_aligned(scene):
    # regression: -0.0 direction components must not break the slab test
    bvh, mesh = scene
    cam = look_at(eye=(0, 0, 2.4), center=(0, 0, 0), width=8, height=8, fov=60)
    rays = orthographic_rays(cam)
    hits = traverse_triangles(bvh, mesh, rays)
    assert np.asarray(hits.hit).all()


def test_pinhole_center_ray_points_at_target(scene):
    cam = look_at(eye=(1, 2, 3), center=(0, 0, 0), width=33, height=33, fov=50)
    rays = pinhole_rays(cam)
    center_dir = np.asarray(rays.dir)[16, 16]
    want = -np.asarray([1, 2, 3], np.float64)
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(center_dir, want, atol=0.03)


def test_vr_omnistereo(scene):
    from nanort_tpu.models.cameras import vr_omnistereo_rays

    bvh, mesh = scene
    rays = vr_omnistereo_rays(64, 32)
    assert rays.org.shape == (32, 64, 3)
    org = np.asarray(rays.org)
    # eye offsets: |org| = ipd/2 everywhere, and left/right eyes differ
    np.testing.assert_allclose(
        np.linalg.norm(org, axis=-1), 0.0635 / 2, rtol=1e-5
    )
    assert not np.allclose(org[0, 10], org[-1, 10])
    from nanort_tpu import traverse_triangles

    hits = traverse_triangles(bvh, mesh, rays)
    assert float(np.asarray(hits.hit).mean()) > 0.5  # inside the box

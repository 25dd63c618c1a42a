"""Embree3-style entry points (the reference's embree3-api client flow,
examples/embree3-api/main.cc:117-266, whose shim source is absent there)."""

import numpy as np
import pytest

from nanort_tpu import make_rays
from nanort_tpu.api.embree3 import (
    RTC_INVALID_GEOMETRY_ID,
    BufferType3,
    GeometryType,
    rtc_attach_geometry,
    rtc_commit_geometry,
    rtc_commit_scene,
    rtc_get_scene_bounds,
    rtc_intersect1,
    rtc_new_device,
    rtc_new_geometry,
    rtc_new_scene,
    rtc_occluded1,
    rtc_release_geometry,
    rtc_set_new_geometry_buffer,
)
from nanort_tpu.io.procedural import make_uv_sphere


def _attach_sphere(device, scene, radius, center):
    v, f = make_uv_sphere(10, 20, radius, center)
    geom = rtc_new_geometry(device, GeometryType.TRIANGLE)
    rtc_set_new_geometry_buffer(geom, BufferType3.VERTEX, len(v))[:] = v
    rtc_set_new_geometry_buffer(geom, BufferType3.INDEX, len(f))[:] = f
    rtc_commit_geometry(geom)
    gid = rtc_attach_geometry(scene, geom)
    rtc_release_geometry(geom)
    return gid


def test_embree3_call_sequence():
    device = rtc_new_device()
    scene = rtc_new_scene(device)
    g0 = _attach_sphere(device, scene, 0.5, (-1.5, 0, 0))
    g1 = _attach_sphere(device, scene, 0.5, (1.5, 0, 0))
    rtc_commit_scene(scene)

    lo, hi = rtc_get_scene_bounds(scene)
    np.testing.assert_allclose(lo, [-2, -0.5, -0.5], atol=1e-5)
    np.testing.assert_allclose(hi, [2, 0.5, 0.5], atol=1e-5)

    rays = make_rays(
        np.array([[-1.5, 0, 5], [1.5, 0, 5], [0, 0, 5]], np.float32),
        np.tile([0, 0, -1.0], (3, 1)).astype(np.float32),
        max_t=100.0,
    )
    rh = rtc_intersect1(scene, rays)
    hit = np.asarray(rh.hit)
    assert hit[0] and hit[1] and not hit[2]
    assert int(rh.geom_id[0]) == g0 and int(rh.geom_id[1]) == g1
    assert int(rh.geom_id[2]) == RTC_INVALID_GEOMETRY_ID
    # tfar: hit distance on hit, input tfar on miss (main.cc:265-266 test)
    np.testing.assert_allclose(np.asarray(rh.tfar)[:2], [4.5, 4.5], rtol=1e-5)
    assert float(rh.tfar[2]) == 100.0
    # Ng points back toward the ray
    ng = np.asarray(rh.Ng)
    assert ng[0] @ [0, 0, -1] < 0 and ng[1] @ [0, 0, -1] < 0

    occ = np.asarray(rtc_occluded1(scene, rays))
    assert occ[0] == -np.inf and occ[1] == -np.inf and occ[2] == 100.0


def test_embree3_validation():
    device = rtc_new_device()
    scene = rtc_new_scene(device)
    geom = rtc_new_geometry(device, GeometryType.TRIANGLE)
    with pytest.raises(ValueError):
        rtc_attach_geometry(scene, geom)  # not committed
    with pytest.raises(ValueError):
        rtc_commit_geometry(geom)  # buffers missing
    with pytest.raises(ValueError):
        rtc_new_geometry(device, "quads")

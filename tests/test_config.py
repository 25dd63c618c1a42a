"""RenderConfig JSON round-trip (picojson config.json equivalent)."""

import numpy as np

from nanort_tpu.utils.config import RenderConfig


def test_roundtrip(tmp_path):
    cfg = RenderConfig(width=64, height=48, camera_type="spherical",
                       eye=(1, 2, 3), fov=70.0)
    p = str(tmp_path / "config.json")
    cfg.save(p)
    c2 = RenderConfig.load(p)
    assert c2.width == 64 and c2.height == 48
    assert c2.camera_type == "spherical"
    assert c2.eye == (1.0, 2.0, 3.0) and c2.fov == 70.0


def test_partial_json(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{"width": 32, "unknown_key": 7}')
    cfg = RenderConfig.load(str(p))
    assert cfg.width == 32 and cfg.height == 512  # defaults survive


def test_camera_from_config():
    cfg = RenderConfig(width=16, height=16, eye=(0, 0, 4))
    cam = cfg.camera()
    assert cam.width == 16
    np.testing.assert_allclose(np.asarray(cam.eye), [0, 0, 4])

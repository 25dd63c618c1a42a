"""OBJ loader round-trips + progressive render loop contract."""

import time

import numpy as np

from nanort_tpu.io.obj import load_obj, save_obj
from nanort_tpu.io.procedural import make_uv_sphere
from nanort_tpu.models.progressive import ProgressiveRenderer


def test_obj_roundtrip(tmp_path):
    v, f = make_uv_sphere(8, 16)
    p = str(tmp_path / "sphere.obj")
    save_obj(p, v, f)
    m = load_obj(p)
    np.testing.assert_allclose(m.vertices, v, rtol=1e-6)
    np.testing.assert_array_equal(m.faces, f)
    assert m.facevarying_normals is None


def test_obj_full_features(tmp_path):
    mtl = tmp_path / "scene.mtl"
    mtl.write_text(
        "newmtl red\nKd 0.8 0.1 0.1\nKe 0 0 0\nNi 1.5\nd 1.0\n"
        "newmtl lamp\nKd 0 0 0\nKe 5 4 3\n"
    )
    obj = tmp_path / "scene.obj"
    obj.write_text(
        "mtllib scene.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\nvt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl red\n"
        "f 1/1/1 2/2/1 3/3/1 4/4/1\n"  # quad -> 2 tris
        "usemtl lamp\n"
        "f 1//1 3//1 4//1\n"
    )
    m = load_obj(str(obj))
    assert m.faces.shape == (3, 3)
    np.testing.assert_array_equal(m.material_ids, [0, 0, 1])
    np.testing.assert_allclose(m.materials["diffuse"][0], [0.8, 0.1, 0.1])
    np.testing.assert_allclose(m.materials["emission"][1], [5, 4, 3])
    assert m.materials["ior"][0] == 1.5
    # facevarying normals present for all faces
    assert m.facevarying_normals.shape == (3, 3, 3)
    np.testing.assert_allclose(m.facevarying_normals[0, 0], [0, 0, 1])
    # uvs only on faces that specify them -> mixed => dropped
    assert m.facevarying_uvs is None


def test_obj_negative_indices(tmp_path):
    obj = tmp_path / "neg.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    m = load_obj(str(obj))
    np.testing.assert_array_equal(m.faces, [[0, 1, 2]])


class TestProgressive:
    def test_accumulates_and_restarts(self):
        calls = []

        def render_pass(p, key):
            calls.append(p)
            return {"rgb": np.full((4, 4, 3), float(p + 1), np.float32)}

        r = ProgressiveRenderer(render_pass, max_passes=5).start()
        assert r.wait_for(5)
        snap = r.snapshot()
        # average of 1..5 = 3.0
        np.testing.assert_allclose(snap["rgb"], 3.0)
        # refresh restarts accumulation from pass 0
        r.request_render()
        assert r.wait_for(5)
        np.testing.assert_allclose(r.snapshot()["rgb"], 3.0)
        r.quit()

    def test_max_passes_cap(self):
        def render_pass(p, key):
            return {"x": np.zeros(1, np.float32)}

        r = ProgressiveRenderer(render_pass, max_passes=3).start()
        assert r.wait_for(3)
        time.sleep(0.05)
        assert r.passes_done == 3  # stops at the cap (gui/main.cc:185)
        r.quit()

    def test_quit_joins(self):
        def render_pass(p, key):
            time.sleep(0.005)
            return {"x": np.zeros(1, np.float32)}

        r = ProgressiveRenderer(render_pass, max_passes=1000).start()
        r.wait_for(2)
        r.quit()
        assert r._thread is None

"""UV atlas baking by ray casting the UV proxy mesh."""

import jax.numpy as jnp
import numpy as np

from nanort_tpu.models.uv_raster import rasterize_uv_atlas
from nanort_tpu.ops.triangle import TriangleMesh


def _quad_mesh():
    # one world-space quad (2 tris) with a full [0,1]^2 UV layout
    v = np.array([[0, 0, 0], [2, 0, 0], [2, 2, 1], [0, 2, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.array(
        [[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]], np.float32
    )
    return TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f)), uvs


def test_full_coverage_quad():
    mesh, uvs = _quad_mesh()
    out = rasterize_uv_atlas(mesh, uvs, atlas_size=32)
    pid = np.asarray(out["prim_id"])
    assert (pid != 0xFFFFFFFF).all()  # the quad covers the whole atlas
    assert set(np.unique(pid)) == {0, 1}
    # position interpolation: texel (u,v) maps to world (2u, 2v, ~)
    pos = np.asarray(out["position"])
    us = (np.arange(32) + 0.5) / 32
    np.testing.assert_allclose(pos[5, :, 0], 2 * us, atol=1e-5)
    np.testing.assert_allclose(pos[:, 7, 1], 2 * us, atol=1e-5)


def test_partial_coverage_and_region():
    # UV island occupying only [0, 0.5]^2
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    uvs = np.array([[[0, 0], [0.5, 0], [0, 0.5]]], np.float32)
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    out = rasterize_uv_atlas(mesh, uvs, atlas_size=64)
    pid = np.asarray(out["prim_id"])
    cov = (pid != 0xFFFFFFFF).mean()
    assert 0.1 < cov < 0.15  # triangle area 0.125 of the atlas
    # zoomed uv_region doubles the apparent island size
    out2 = rasterize_uv_atlas(
        mesh, uvs, atlas_size=64, uv_region=((0, 0), (0.5, 0.5))
    )
    cov2 = (np.asarray(out2["prim_id"]) != 0xFFFFFFFF).mean()
    np.testing.assert_allclose(cov2, 0.5, atol=0.03)


def test_attribute_baking():
    mesh, uvs = _quad_mesh()
    colors = np.zeros((2, 3, 3), np.float32)
    colors[:, :, 0] = 1.0  # constant red
    out = rasterize_uv_atlas(mesh, uvs, atlas_size=16, attributes={"col": colors})
    col = np.asarray(out["col"])
    np.testing.assert_allclose(col[..., 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(col[..., 1], 0.0, atol=1e-6)

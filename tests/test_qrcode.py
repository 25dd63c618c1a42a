"""QR encoder (reference examples/qrcode vendors qrcodegen.c; ours is
from scratch) — encode->verify roundtrip + raytraceable extrusion."""

import numpy as np
import pytest

from nanort_tpu.io.qrcode import generate_qr, verify_qr


@pytest.mark.parametrize("text,level", [
    ("HELLO TPU", "M"),
    ("nanort-tpu", "H"),
    ("https://github.com/lighttransport/nanort", "Q"),
    ("x" * 200, "L"),              # version 9, interleaved blocks
    ("v10 " + "y" * 258, "L"),     # version 10, 16-bit char count
    ("", "H"),
])
def test_roundtrip(text, level):
    m = generate_qr(text, level)
    size = m.shape[0]
    version = (size - 17) // 4
    assert size == 17 + 4 * version
    # quiet structural checks: three finder cores are dark
    for r, c in ((3, 3), (3, size - 4), (size - 4, 3)):
        assert m[r, c]
    assert verify_qr(m).decode() == text


def test_version_selection_and_errors():
    assert generate_qr("a", "L").shape[0] == 21  # version 1
    with pytest.raises(ValueError):
        generate_qr("z" * 5000, "L")
    with pytest.raises(ValueError):
        generate_qr("a", "X")
    forced = generate_qr("a", "M", version=5)
    assert forced.shape[0] == 17 + 20
    assert verify_qr(forced).decode() == "a"


def test_masks_differ_but_decode_same():
    # corrupting one module must break the syndrome check
    m = generate_qr("tamper", "M").copy()
    # flip a data module (not a function pattern): center-ish
    m[m.shape[0] - 2, m.shape[1] - 2] ^= True
    with pytest.raises(ValueError):
        verify_qr(m)


def test_qr_extrudes_to_mesh():
    import jax.numpy as jnp

    from nanort_tpu import build_triangle_bvh, make_rays, traverse_triangles
    from nanort_tpu.io.voxels import grid2d_to_boxes
    from nanort_tpu.ops.triangle import TriangleMesh

    grid = generate_qr("RT", "M")
    v, f = grid2d_to_boxes(grid)  # (X, Z) cells extruded along +Y
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh)
    n = grid.shape[0]
    # orthographic rays down -Y onto the symbol must reproduce the pattern
    xs = (np.arange(n) + 0.5).astype(np.float32)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    org = np.stack([gx, np.full_like(gx, 10.0), gz], -1).reshape(-1, 3)
    dirs = np.tile([0, -1.0, 0], (n * n, 1)).astype(np.float32)
    hits = traverse_triangles(bvh, mesh, make_rays(org, dirs))
    got = np.asarray(hits.hit).reshape(n, n)
    np.testing.assert_array_equal(got, np.asarray(grid))

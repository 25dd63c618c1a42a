"""Unit tests for core math: safe_inverse, robust AABB, watertight triangle.

Mirrors the reference's semantics with analytically known rays
(SURVEY.md §4: the test pyramid the reference lacks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nanort_tpu import intersect_ray_aabb, safe_inverse
from nanort_tpu.ops.triangle import intersect_triangles, ray_coeffs

pytestmark = pytest.mark.quick  # core-math half of the -m quick gate


class TestSafeInverse:
    def test_regular(self):
        v = jnp.array([2.0, -4.0, 0.5], jnp.float32)
        np.testing.assert_allclose(safe_inverse(v), [0.5, -0.25, 2.0])

    def test_zero_maps_to_signed_inf(self):
        v = jnp.array([0.0, -0.0, 1e-30], jnp.float32)
        r = np.asarray(safe_inverse(v))
        assert r[0] == np.inf
        assert r[1] == -np.inf  # copysign semantics (nanort.h:421-423)
        assert r[2] == np.inf

    def test_f64(self):
        v = jnp.array([0.0, 2.0, -1e-300], jnp.float64)
        r = np.asarray(safe_inverse(v))
        assert r[0] == np.inf and r[1] == 0.5 and r[2] == -np.inf


class TestRayAABB:
    def _test(self, org, dir, bmin, bmax, min_t=0.0, max_t=1e30):
        org = jnp.asarray(org, jnp.float32)
        dir = jnp.asarray(dir, jnp.float32)
        return intersect_ray_aabb(
            jnp.asarray(bmin, jnp.float32),
            jnp.asarray(bmax, jnp.float32),
            org,
            safe_inverse(dir),
            dir < 0,
            jnp.float32(min_t),
            jnp.float32(max_t),
        )

    def test_hit_through_center(self):
        hit, tmin, tmax = self._test([0, 0, -5], [0, 0, 1], [-1, -1, -1], [1, 1, 1])
        assert bool(hit)
        assert np.isclose(tmin, 4.0) and np.isclose(tmax, 6.0, rtol=1e-6)

    def test_miss(self):
        hit, _, _ = self._test([0, 5, -5], [0, 0, 1], [-1, -1, -1], [1, 1, 1])
        assert not bool(hit)

    def test_negative_direction(self):
        hit, tmin, _ = self._test([0, 0, 5], [0, 0, -1], [-1, -1, -1], [1, 1, 1])
        assert bool(hit) and np.isclose(tmin, 4.0)

    def test_parallel_inside_slab(self):
        # ray parallel to x axis, inside box in y/z: 0 * inf NaN path
        hit, _, _ = self._test([-5, 0, 0], [1, 0, 0], [-1, -1, -1], [1, 1, 1])
        assert bool(hit)

    def test_parallel_outside_slab(self):
        hit, _, _ = self._test([-5, 3, 0], [1, 0, 0], [-1, -1, -1], [1, 1, 1])
        assert not bool(hit)

    def test_ray_on_slab_plane(self):
        # origin exactly on the y = -1 plane, moving in +x: (bmin-org)=0
        # times inf = NaN; NaN-filtered fold must keep the interval valid
        hit, _, _ = self._test([-5, -1, 0], [1, 0, 0], [-1, -1, -1], [1, 1, 1])
        assert bool(hit)

    def test_max_t_cut(self):
        hit, _, _ = self._test(
            [0, 0, -5], [0, 0, 1], [-1, -1, -1], [1, 1, 1], max_t=3.0
        )
        assert not bool(hit)

    def test_batched(self):
        org = jnp.zeros((8, 3), jnp.float32).at[:, 2].set(-5.0)
        dir = jnp.zeros((8, 3), jnp.float32).at[:, 2].set(1.0)
        hit, tmin, _ = intersect_ray_aabb(
            jnp.asarray([-1, -1, -1], jnp.float32),
            jnp.asarray([1, 1, 1], jnp.float32),
            org,
            safe_inverse(dir),
            dir < 0,
            jnp.zeros(8, jnp.float32),
            jnp.full(8, 1e30, jnp.float32),
        )
        assert hit.shape == (8,) and bool(hit.all())


class TestRayCoeffs:
    def test_axes_permutation(self):
        d = jnp.array([0.1, 0.2, 1.0], jnp.float32)
        c = ray_coeffs(d)
        assert int(c.kz) == 2 and int(c.kx) == 0 and int(c.ky) == 1

    def test_negative_kz_swaps_winding(self):
        d = jnp.array([0.1, 0.2, -1.0], jnp.float32)
        c = ray_coeffs(d)
        assert int(c.kz) == 2 and int(c.kx) == 1 and int(c.ky) == 0

    def test_tie_picks_first_axis(self):
        d = jnp.array([1.0, 1.0, 1.0], jnp.float32)
        c = ray_coeffs(d)
        assert int(c.kz) == 0  # strict < chain keeps the earliest max


def _isect_one(org, dir, p0, p1, p2, **kw):
    org = jnp.asarray(org, jnp.float32)
    dir = jnp.asarray(dir, jnp.float32)
    c = ray_coeffs(dir)
    t_cur = kw.pop("t_cur", 1e30)
    min_t = kw.pop("min_t", 0.0)
    return intersect_triangles(
        c,
        org,
        jnp.float32(min_t),
        jnp.float32(t_cur),
        jnp.asarray(p0, jnp.float32),
        jnp.asarray(p1, jnp.float32),
        jnp.asarray(p2, jnp.float32),
        **kw,
    )


class TestWatertightTriangle:
    P0, P1, P2 = [-1, -1, 0], [1, -1, 0], [0, 1, 0]

    def test_center_hit(self):
        valid, t, u, v = _isect_one([0, -0.2, -3], [0, 0, 1], self.P0, self.P1, self.P2)
        assert bool(valid)
        assert np.isclose(t, 3.0)
        # barycentric reconstruction: P = (1-u-v)*p0 + u*p1 + v*p2
        w = 1.0 - float(u) - float(v)
        p = (
            w * np.array(self.P0) + float(u) * np.array(self.P1)
            + float(v) * np.array(self.P2)
        )
        np.testing.assert_allclose(p, [0, -0.2, 0], atol=1e-6)

    def test_miss_outside(self):
        valid, *_ = _isect_one([2, 2, -3], [0, 0, 1], self.P0, self.P1, self.P2)
        assert not bool(valid)

    def test_backface_cull(self):
        # hit from behind (ray along -z sees the back face of a CCW tri)
        valid, *_ = _isect_one([0, -0.2, 3], [0, 0, -1], self.P0, self.P1, self.P2)
        assert bool(valid)
        valid_c, *_ = _isect_one(
            [0, -0.2, 3], [0, 0, -1], self.P0, self.P1, self.P2,
            cull_back_face=True,
        )
        # front hit must survive culling
        valid_f, *_ = _isect_one(
            [0, -0.2, -3], [0, 0, 1], self.P0, self.P1, self.P2,
            cull_back_face=True,
        )
        assert bool(valid_c) != bool(valid_f)  # exactly one side culled

    def test_t_window(self):
        valid, *_ = _isect_one(
            [0, -0.2, -3], [0, 0, 1], self.P0, self.P1, self.P2, t_cur=2.0
        )
        assert not bool(valid)
        valid, *_ = _isect_one(
            [0, -0.2, -3], [0, 0, 1], self.P0, self.P1, self.P2, min_t=4.0
        )
        assert not bool(valid)

    def test_equal_t_accepted(self):
        # tt == t_cur must be accepted (replace semantics, nanort.h:1131)
        valid, t, _, _ = _isect_one(
            [0, -0.2, -3], [0, 0, 1], self.P0, self.P1, self.P2, t_cur=3.0
        )
        assert bool(valid)

    def test_vertex_hit_watertight(self):
        # ray exactly through a vertex: U/V/W hit the exact-zero fallback
        valid, t, u, v = _isect_one([0, 1, -3], [0, 0, 1], self.P0, self.P1, self.P2)
        assert bool(valid)
        np.testing.assert_allclose(float(u) + float(v), 1.0, atol=1e-6)

    def test_edge_hit_watertight(self):
        valid, *_ = _isect_one([0, -1, -3], [0, 0, 1], self.P0, self.P1, self.P2)
        assert bool(valid)

    def test_shared_edge_no_double_gap(self):
        # two triangles sharing an edge: a ray through the shared edge must
        # hit at least one (watertightness guarantee of the WBW algorithm)
        q0, q1, q2, q3 = [-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]
        rng = np.random.default_rng(7)
        for _ in range(50):
            y = rng.uniform(-0.99, 0.99)
            # the shared diagonal is x = -y line? use edge (q0,q2): x=y
            org = [y, y, -3]  # on the shared diagonal q0-q2
            v1, *_ = _isect_one(org, [0, 0, 1], q0, q1, q2)
            v2, *_ = _isect_one(org, [0, 0, 1], q0, q2, q3)
            assert bool(v1) or bool(v2)

    def test_degenerate_triangle_rejected(self):
        valid, *_ = _isect_one([0, 0, -3], [0, 0, 1], [0, 0, 0], [0, 0, 0], [0, 0, 0])
        assert not bool(valid)

    def test_batched_rays_by_tris(self):
        orgs = jnp.asarray(np.tile([[0, -0.2, -3.0]], (4, 1)), jnp.float32)
        dirs = jnp.asarray(np.tile([[0, 0, 1.0]], (4, 1)), jnp.float32)
        c = ray_coeffs(dirs)
        import jax

        cl = jax.tree_util.tree_map(lambda x: x[:, None], c)
        p0 = jnp.asarray([self.P0] * 3, jnp.float32)[None]
        p1 = jnp.asarray([self.P1] * 3, jnp.float32)[None]
        p2 = jnp.asarray([self.P2] * 3, jnp.float32)[None]
        valid, t, u, v = intersect_triangles(
            cl,
            orgs[:, None, :],
            jnp.zeros((4, 1), jnp.float32),
            jnp.full((4, 1), 1e30, jnp.float32),
            p0,
            p1,
            p2,
        )
        assert valid.shape == (4, 3) and bool(valid.all())


class TestRegressionAccuracyProblem30:
    """Reference regression: double-precision ray with dir[0] = -5.3e-17
    must still hit an axis-aligned triangle
    (test/regression/possible-accuracy-problem-30/main.cc:9-36)."""

    def test_tiny_direction_component(self):
        p0 = [-1.0, -1.0, 5.0]
        p1 = [1.0, -1.0, 5.0]
        p2 = [0.0, 1.0, 5.0]
        org = jnp.asarray([0.0, 0.0, 0.0], jnp.float64)
        dir = jnp.asarray([-5.3e-17, 0.0, 1.0], jnp.float64)
        c = ray_coeffs(dir)
        valid, t, u, v = intersect_triangles(
            c,
            org,
            jnp.float64(0.0),
            jnp.float64(1e308),
            jnp.asarray(p0, jnp.float64),
            jnp.asarray(p1, jnp.float64),
            jnp.asarray(p2, jnp.float64),
        )
        assert bool(valid)
        assert np.isclose(float(t), 5.0)


# ---------------------------------------------------------------------------
# core/rowpack: packed row permutation
# ---------------------------------------------------------------------------


def test_rowpack_roundtrip_and_permute():
    from nanort_tpu.core.rowpack import pack_rows, permute_rows, unpermute_rows

    R = 257
    rng = np.random.default_rng(3)
    tree = {
        "f": jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32)),
        "i": jnp.asarray(rng.integers(-(2**31), 2**31 - 1, (R,), dtype=np.int32)),
        # uint32 with the miss sentinel: bitcast to f32 this is a NaN
        # payload — the packed matrix must be int32 so data movement
        # can't canonicalize it (observed on TPU gathers)
        "u": jnp.asarray(
            np.where(rng.random(R) < 0.5, 0xFFFFFFFF,
                     rng.integers(0, 2**32 - 1, R)).astype(np.uint32)),
        "b": jnp.asarray(rng.random(R) < 0.3),
    }
    m, unpack = pack_rows(tree)
    assert m.dtype == jnp.int32
    back = unpack(m)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(tree[k]))
        assert back[k].dtype == tree[k].dtype

    order = jnp.asarray(rng.permutation(R).astype(np.int32))
    p = permute_rows(tree, order)
    onp = np.asarray(order)
    for k in tree:
        np.testing.assert_array_equal(
            np.asarray(p[k]), np.asarray(tree[k])[onp])
    # unpermute is the exact inverse scatter
    restored = unpermute_rows(p, order)
    for k in tree:
        np.testing.assert_array_equal(
            np.asarray(restored[k]), np.asarray(tree[k]))

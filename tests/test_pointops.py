"""Numerical tests for pointops-jax against brute-force numpy oracles.

The oracles re-derive the documented CUDA kernel semantics independently
(greedy FPS, exact kNN sort, IDW interpolation, etc.) — reference behavior,
not reference code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloudmatters_tpu.ops import pointops as P


def _np_fps(xyz: np.ndarray, npoints: int) -> np.ndarray:
    """Greedy farthest point sampling oracle, seeded at index 0."""
    n = xyz.shape[0]
    dist = np.full(n, 1e10)
    out = np.zeros(npoints, np.int64)
    last = 0
    for i in range(1, npoints):
        d = np.sum((xyz - xyz[last]) ** 2, -1)
        dist = np.minimum(dist, d)
        last = int(np.argmax(dist))
        out[i] = last
    return out


def _np_knn(q: np.ndarray, r: np.ndarray, k: int):
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


class TestFPS:
    def test_matches_greedy_oracle(self, rng):
        xyz = rng.randn(2, 100, 3).astype(np.float32)
        mask = np.ones((2, 100), bool)
        idx = np.asarray(P.farthest_point_sampling_padded(jnp.asarray(xyz), jnp.asarray(mask), 16))
        for b in range(2):
            np.testing.assert_array_equal(idx[b], _np_fps(xyz[b], 16))

    def test_ignores_padding(self, rng):
        xyz = rng.randn(1, 64, 3).astype(np.float32)
        mask = np.zeros((1, 64), bool)
        mask[0, :40] = True
        xyz[0, 40:] = 100.0  # far-away garbage in the padding slots
        idx = np.asarray(P.farthest_point_sampling_padded(jnp.asarray(xyz), jnp.asarray(mask), 8))
        assert (idx < 40).all()
        np.testing.assert_array_equal(idx[0], _np_fps(xyz[0, :40], 8))

    def test_fewer_valid_than_npoints_repeats(self, rng):
        xyz = rng.randn(1, 32, 3).astype(np.float32)
        mask = np.zeros((1, 32), bool)
        mask[0, :5] = True
        idx = np.asarray(P.farthest_point_sampling_padded(jnp.asarray(xyz), jnp.asarray(mask), 8))
        assert (idx < 5).all()
        assert set(idx[0, :5].tolist()) == set(range(5))

    def test_packed_wrapper_offsets(self, rng):
        xyz = rng.randn(30, 3).astype(np.float32)
        offset = np.array([10, 30])
        new_offset = np.array([4, 8])
        idx = P.farthest_point_sampling(xyz, offset, new_offset)
        assert idx.shape == (8,)
        assert (idx[:4] < 10).all()
        assert (idx[4:] >= 10).all() and (idx[4:] < 30).all()
        np.testing.assert_array_equal(idx[:4], _np_fps(xyz[:10], 4))
        np.testing.assert_array_equal(idx[4:], _np_fps(xyz[10:], 4) + 10)


class TestKNN:
    def test_exact_vs_oracle(self, rng):
        q = rng.randn(1, 37, 3).astype(np.float32)
        r = rng.randn(1, 211, 3).astype(np.float32)
        mask = np.ones((1, 211), bool)
        idx, d2 = P.knn_query_padded(jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask), 8, chunk=64)
        oid, od2 = _np_knn(q[0], r[0], 8)
        np.testing.assert_allclose(np.asarray(d2)[0], od2, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx)[0], oid)

    def test_short_segment_padding(self, rng):
        q = rng.randn(1, 4, 3).astype(np.float32)
        r = rng.randn(1, 16, 3).astype(np.float32)
        mask = np.zeros((1, 16), bool)
        mask[0, :3] = True
        idx, d2 = P.knn_query_padded(jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask), 5)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        assert (idx[0, :, 3:] == -1).all()
        assert (d2[0, :, 3:] == 1e10).all()
        assert (idx[0, :, :3] >= 0).all()

    def test_sorted_ascending(self, rng):
        q = rng.randn(2, 10, 3).astype(np.float32)
        r = rng.randn(2, 50, 3).astype(np.float32)
        mask = np.ones((2, 50), bool)
        _, d2 = P.knn_query_padded(jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask), 6)
        d2 = np.asarray(d2)
        assert (np.diff(d2, axis=-1) >= -1e-7).all()

    def test_packed_wrapper_two_segments(self, rng):
        xyz = rng.randn(40, 3).astype(np.float32)
        offset = np.array([25, 40])
        idx, dist = P.knn_query(4, xyz, offset)
        assert idx.shape == (40, 4)
        # neighbors stay within their segment
        assert (idx[:25] < 25).all()
        assert (idx[25:] >= 25).all()
        # first neighbor of each point is itself (dist 0)
        np.testing.assert_allclose(dist[:, 0], 0.0, atol=1e-3)


class TestGrouping:
    def test_gather_and_holes(self, rng):
        feat = rng.randn(1, 20, 5).astype(np.float32)
        idx = np.array([[[0, 3, -1], [7, -1, 2]]], np.int32)
        out = np.asarray(P.grouping_padded(jnp.asarray(idx), jnp.asarray(feat)))
        np.testing.assert_allclose(out[0, 0, 0], feat[0, 0])
        np.testing.assert_allclose(out[0, 0, 1], feat[0, 3])
        assert (out[0, 0, 2] == 0).all()
        assert (out[0, 1, 1] == 0).all()

    def test_with_xyz_relative(self, rng):
        xyz = rng.randn(1, 20, 3).astype(np.float32)
        new_xyz = rng.randn(1, 2, 3).astype(np.float32)
        feat = rng.randn(1, 20, 4).astype(np.float32)
        idx = np.array([[[1, 2], [3, -1]]], np.int32)
        out = np.asarray(P.grouping_padded(
            jnp.asarray(idx), jnp.asarray(feat), jnp.asarray(xyz), jnp.asarray(new_xyz), with_xyz=True))
        assert out.shape == (1, 2, 2, 7)
        np.testing.assert_allclose(out[0, 0, 0, :3], xyz[0, 1] - new_xyz[0, 0], rtol=1e-6)
        assert (out[0, 1, 1] == 0).all()

    def test_grad_flows(self, rng):
        feat = jnp.asarray(rng.randn(1, 10, 4).astype(np.float32))
        idx = jnp.asarray(np.array([[[0, 1], [1, 2]]], np.int32))

        def loss(f):
            return jnp.sum(P.grouping_padded(idx, f) ** 2)

        g = jax.grad(loss)(feat)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)[0, 1]).sum() > 0  # index 1 used twice


class TestInterpolation:
    def test_idw_weights(self, rng):
        xyz = rng.randn(1, 30, 3).astype(np.float32)
        new_xyz = rng.randn(1, 7, 3).astype(np.float32)
        feat = rng.randn(1, 30, 6).astype(np.float32)
        mask = np.ones((1, 30), bool)
        out = np.asarray(P.interpolation_padded(
            jnp.asarray(xyz), jnp.asarray(new_xyz), jnp.asarray(feat), jnp.asarray(mask)))
        idxo, d2o = _np_knn(new_xyz[0], xyz[0], 3)
        recip = 1.0 / (np.sqrt(d2o) + 1e-8)
        w = recip / recip.sum(1, keepdims=True)
        expected = np.einsum("mkc,mk->mc", feat[0][idxo], w)
        np.testing.assert_allclose(out[0], expected, rtol=1e-4, atol=1e-5)


class TestSubtractionAggregation:
    def test_subtraction(self, rng):
        x1 = rng.randn(1, 8, 4).astype(np.float32)
        x2 = rng.randn(1, 8, 4).astype(np.float32)
        idx = rng.randint(0, 8, (1, 8, 3)).astype(np.int32)
        out = np.asarray(P.subtraction_padded(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(idx)))
        for i in range(8):
            for k in range(3):
                np.testing.assert_allclose(out[0, i, k], x1[0, i] - x2[0, idx[0, i, k]], rtol=1e-6)

    def test_aggregation_weight_tiling(self, rng):
        n, k, c, wc = 6, 3, 8, 4
        inp = rng.randn(1, n, c).astype(np.float32)
        pos = rng.randn(1, n, k, c).astype(np.float32)
        w = rng.randn(1, n, k, wc).astype(np.float32)
        idx = rng.randint(0, n, (1, n, k)).astype(np.int32)
        out = np.asarray(P.aggregation_padded(jnp.asarray(inp), jnp.asarray(pos), jnp.asarray(w), jnp.asarray(idx)))
        expected = np.zeros((n, c), np.float32)
        for i in range(n):
            for kk in range(k):
                for cc in range(c):
                    expected[i, cc] += (inp[0, idx[0, i, kk], cc] + pos[0, i, kk, cc]) * w[0, i, kk, cc % wc]
        np.testing.assert_allclose(out[0], expected, rtol=1e-4, atol=1e-5)


class TestAttentionSteps:
    def test_relation_step(self, rng):
        n, g, c, m = 5, 2, 4, 9
        q = rng.randn(n, g, c).astype(np.float32)
        k = rng.randn(n, g, c).astype(np.float32)
        w = rng.randn(c).astype(np.float32)
        it = rng.randint(0, n, m)
        ir = rng.randint(0, n, m)
        out = np.asarray(P.attention_relation_step(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(w), jnp.asarray(it), jnp.asarray(ir)))
        expected = np.einsum("mgc,mgc,c->mg", q[it], k[ir], w)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_fusion_step_scatter(self, rng):
        n, g, c, m = 4, 2, 3, 7
        w = rng.randn(m, g).astype(np.float32)
        v = rng.randn(n, g, c).astype(np.float32)
        it = rng.randint(0, n, m)
        ir = rng.randint(0, n, m)
        out = np.asarray(P.attention_fusion_step(
            jnp.asarray(w), jnp.asarray(v), jnp.asarray(it), jnp.asarray(ir)))
        expected = np.zeros((n, g, c), np.float32)
        for e in range(m):
            expected[it[e]] += w[e][:, None] * v[ir[e]]
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_grads_exist(self, rng):
        n, g, c, m = 4, 2, 3, 7
        q = jnp.asarray(rng.randn(n, g, c).astype(np.float32))
        k = jnp.asarray(rng.randn(n, g, c).astype(np.float32))
        w = jnp.asarray(rng.randn(c).astype(np.float32))
        it = jnp.asarray(rng.randint(0, n, m))
        ir = jnp.asarray(rng.randint(0, n, m))
        g1 = jax.grad(lambda a: jnp.sum(P.attention_relation_step(a, k, w, it, ir) ** 2))(q)
        assert np.isfinite(np.asarray(g1)).all()


class TestBallQuery:
    def test_in_range_and_padding(self, rng):
        q = np.zeros((1, 1, 3), np.float32)
        r = np.zeros((1, 8, 3), np.float32)
        # distances: 0.1, 0.2, ..., 0.8 along x
        r[0, :, 0] = np.linspace(0.1, 0.8, 8)
        mask = np.ones((1, 8), bool)
        idx, d2 = P.ball_query_padded(jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask), 4, 0.45, 0.15)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        # in range: 0.2, 0.3, 0.4 -> 3 candidates < nsample=4 -> pad with -1
        assert (idx[0, 0, :3] == np.array([1, 2, 3])).all()
        assert idx[0, 0, 3] == -1
        assert d2[0, 0, 3] == 1e10

    def test_oversampled_strided(self, rng):
        q = np.zeros((1, 1, 3), np.float32)
        r = np.zeros((1, 16, 3), np.float32)
        r[0, :, 0] = np.linspace(0.1, 0.4, 16)
        mask = np.ones((1, 16), bool)
        idx, _ = P.ball_query_padded(jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask), 4, 0.5, 0.0)
        idx = np.asarray(idx)
        # 16 candidates, nsample 4 -> stride 4: picks sorted positions 0,4,8,12
        assert (idx[0, 0] == np.array([0, 4, 8, 12])).all()


class TestOffsets:
    def test_roundtrip(self):
        offset = np.array([3, 7, 12])
        batch = P.offset2batch(offset)
        np.testing.assert_array_equal(batch, [0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 2])
        np.testing.assert_array_equal(P.batch2offset(batch), offset)


class TestQueryAndGroup:
    def test_knn_query_and_group_with_xyz(self, rng):
        xyz = rng.randn(20, 3).astype(np.float32)
        feat = rng.randn(20, 5).astype(np.float32)
        offset = np.array([20])
        out, idx = P.knn_query_and_group(feat, xyz, offset, nsample=4, with_xyz=True)
        assert out.shape == (20, 4, 8)
        # nearest neighbor of each point is itself: relative xyz == 0
        np.testing.assert_allclose(out[:, 0, :3], 0.0, atol=1e-5)
        np.testing.assert_allclose(out[:, 0, 3:], feat, rtol=1e-6)

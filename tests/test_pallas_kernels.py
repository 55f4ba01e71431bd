"""Pallas TPU kernel parity tests (skipped off-TPU; CI forces CPU).

Run on the chip: PCM_TEST_TPU=1 python -m pytest tests/test_pallas_kernels.py
(conftest forces CPU otherwise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

on_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernels are TPU-only"
)


@on_tpu
class TestPallasKNN:
    def test_matches_xla(self):
        from pointcloudmatters_tpu.ops.pallas_knn import knn_query_padded_pallas
        from pointcloudmatters_tpu.ops.pointops import _knn_query_padded_xla

        rng = np.random.RandomState(0)
        B, N, M, K = 4, 2048, 256, 16
        xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        mask = jnp.asarray(
            np.arange(N)[None] < np.array([[1500], [2048], [900], [2000]])
        )
        q = jnp.asarray(rng.rand(B, M, 3), jnp.float32)
        ref_i, ref_d = _knn_query_padded_xla(q, xyz, mask, K)
        got_i, got_d = knn_query_padded_pallas(q, xyz, mask, K)
        # distances identical; indices may differ on exact ties
        np.testing.assert_allclose(
            np.asarray(ref_d), np.asarray(got_d), atol=1e-4
        )
        agree = (np.asarray(ref_i) == np.asarray(got_i)).mean()
        assert agree > 0.98, agree

    def test_bf16_inputs(self):
        from pointcloudmatters_tpu.ops.pallas_knn import knn_query_padded_pallas

        rng = np.random.RandomState(1)
        xyz = jnp.asarray(rng.rand(2, 512, 3), jnp.bfloat16)
        q = jnp.asarray(rng.rand(2, 128, 3), jnp.bfloat16)
        mask = jnp.ones((2, 512), bool)
        idx, d2 = knn_query_padded_pallas(q, xyz, mask, 8)
        assert idx.shape == (2, 128, 8)
        assert bool(jnp.all(jnp.isfinite(d2)))


@on_tpu
class TestPallasFPS:
    def test_fps_properties(self):
        from pointcloudmatters_tpu.ops.pallas_fps import (
            farthest_point_sampling_padded_pallas,
        )

        rng = np.random.RandomState(0)
        B, N, M = 4, 1024, 128
        xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        counts = np.array([800, 1024, 500, 200])
        mask = jnp.asarray(np.arange(N)[None] < counts[:, None])
        idx = np.asarray(farthest_point_sampling_padded_pallas(xyz, mask, M))
        assert idx.shape == (B, M)
        for b in range(B):
            # all selections point at valid slots
            assert (idx[b] < counts[b]).all()
            # no duplicates while enough valid points exist
            assert len(np.unique(idx[b])) == M
            assert idx[b, 0] == 0  # seeded at the segment start

    def test_fps_covers_space_better_than_random(self):
        """FPS minimum pairwise distance must beat random sampling."""
        from pointcloudmatters_tpu.ops.pallas_fps import (
            farthest_point_sampling_padded_pallas,
        )

        rng = np.random.RandomState(2)
        pts = rng.rand(1, 4096, 3).astype(np.float32)
        mask = jnp.ones((1, 4096), bool)
        idx = np.asarray(
            farthest_point_sampling_padded_pallas(jnp.asarray(pts), mask, 64)
        )[0]

        def min_pairwise(sel):
            d = np.linalg.norm(sel[:, None] - sel[None, :], axis=-1)
            np.fill_diagonal(d, np.inf)
            return d.min()

        fps_spread = min_pairwise(pts[0][idx])
        rand_spread = min_pairwise(pts[0][rng.choice(4096, 64, replace=False)])
        assert fps_spread > rand_spread

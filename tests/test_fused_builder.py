"""Fused token-builder (ops/fused_builder.py) — CPU-verifiable parts.

The Pallas forward only runs on TPU (tests/test_fused_builder_tpu.py); here
we validate the pieces whose semantics are backend-independent:
  * the XLA reference core against the unfused GroupedBNReluMax math,
  * both custom-VJP backwards (scatter-free data boundary, dense-dg core
    boundary) against plain autodiff of the unfused expression,
  * hole / duplicate-neighbor / all-hole-query edge cases,
  * the packing helper round-trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointcloudmatters_tpu.ops import fused_builder as fb
from pointcloudmatters_tpu.ops.pointops import gather_rows_padded


def _mk(seed=0, B=2, N=384, M=256, K=16, D=128, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    src = jnp.asarray(rng.randn(B, N, 9) * 0.4, dtype)
    query = jnp.asarray(rng.randn(B, M, 9) * 0.4, dtype)
    W = jnp.asarray(rng.randn(9, D) * 0.1, dtype)
    nn = rng.randint(0, N, (B, M, K)).astype(np.int32)
    nn[:, -8:, :] = -1                 # all-hole (padding) queries
    nn[0, 3, 5:] = nn[0, 3, 0]         # duplicate neighbors -> exact ties
    nn[1, 7, ::2] = -1                 # partial holes
    return src, query, W, jnp.asarray(nn)


def _unfused(g, h, nn_idx):
    hole = (nn_idx < 0)[..., None]
    gg = gather_rows_padded(g, nn_idx)
    gg = jnp.where(hole, jnp.zeros((), g.dtype), gg)
    x = gg - h[:, :, None, :]
    vmax = jnp.max(jnp.where(hole, -jnp.inf, x), axis=2)
    vmin = jnp.min(jnp.where(hole, jnp.inf, x), axis=2)
    xz = jnp.where(hole, jnp.zeros((), x.dtype), x)
    total = jnp.sum(xz, axis=(0, 1, 2), dtype=jnp.float32)
    total_sq = jnp.sum(xz * xz, axis=(0, 1, 2), dtype=jnp.float32)
    return vmax, vmin, total, total_sq


def _scalarize(outs, cvec):
    vmax, vmin, total, total_sq = outs
    vmax = jnp.where(jnp.isfinite(vmax), vmax, 0.0)
    vmin = jnp.where(jnp.isfinite(vmin), vmin, 0.0)
    return (jnp.sum(vmax.astype(jnp.float32) * cvec)
            + jnp.sum(vmin.astype(jnp.float32) * (cvec + 0.3))
            + jnp.sum(total) * 1e-3 + jnp.sum(total_sq) * 1e-4)


def test_xla_core_matches_unfused_forward():
    src, query, W, nn = _mk()
    g, h = src @ W, query @ W
    vmax, vmin, sg, bm, total, total_sq = jax.jit(fb._core_xla)(g, h, nn)
    evmax, evmin, etot, etsq = _unfused(g, h, nn)
    np.testing.assert_array_equal(np.asarray(vmax), np.asarray(evmax))
    np.testing.assert_array_equal(np.asarray(vmin), np.asarray(evmin))
    np.testing.assert_allclose(np.asarray(total), np.asarray(etot), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(total_sq), np.asarray(etsq),
                               rtol=1e-5)
    # tie bitmaps: every live query has >= 1 max-tie and >= 1 min-tie
    live = np.asarray((nn >= 0).any(-1))
    bmn = np.asarray(bm).view(np.uint32)
    assert ((bmn[live] & 0xFFFF) != 0).all()
    assert ((bmn[live] >> 16) != 0).all()
    assert (bmn[~live] == 0).all()
    # duplicate-neighbor row (k=0 == k=5..15): identical values must share
    # tie bits — whenever k=0 is max-tied (bit 0), k=5 is too (bit 5), and
    # likewise on the min side (bits 16 / 21)
    row = bmn[0, 3]
    assert np.array_equal(row & 1, (row >> 5) & 1)
    assert np.array_equal((row >> 16) & 1, (row >> 21) & 1)


def test_data_boundary_gradients_match_autodiff():
    src, query, W, nn = _mk()
    rng = np.random.RandomState(1)
    cvec = jnp.asarray(rng.randn(*(nn.shape[:2] + (W.shape[1],))) * 0.1,
                       jnp.float32)

    def loss_ref(W):
        return _scalarize(_unfused(src @ W, query @ W, nn), cvec)

    def loss_data(W):
        return _scalarize(
            fb.grouped_stats_data(src, W, query @ W, nn, impl="xla"), cvec
        )

    gr = jax.jit(jax.grad(loss_ref))(W)
    gd = jax.jit(jax.grad(loss_data))(W)
    a, b = np.asarray(gd), np.asarray(gr)
    assert np.abs(a - b).max() / max(1.0, np.abs(b).max()) < 5e-3


def test_core_boundary_gradients_match_autodiff():
    src, query, W, nn = _mk()
    g0, h0 = src @ W, query @ W
    rng = np.random.RandomState(2)
    cvec = jnp.asarray(rng.randn(*(nn.shape[:2] + (W.shape[1],))) * 0.1,
                       jnp.float32)

    gr = jax.jit(jax.grad(
        lambda g, h: _scalarize(_unfused(g, h, nn), cvec), argnums=(0, 1)
    ))(g0, h0)
    gc = jax.jit(jax.grad(
        lambda g, h: _scalarize(
            fb.grouped_stats_core(g, h, nn, impl="xla"), cvec
        ),
        argnums=(0, 1),
    ))(g0, h0)
    for a, b in zip(gc, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / max(1e-6, np.abs(b).max()) < 1e-5


def test_chunk_transpose_exact():
    """The MXU identity-matmul transpose is bit-exact for bf16 values."""
    rng = np.random.RandomState(3)
    g = jnp.asarray(rng.randn(2, 256, 64), jnp.bfloat16)
    gp = fb._chunk_transpose(g)  # (B, 2, 64, 128) f32
    assert gp.shape == (2, 2, 64, 128) and gp.dtype == jnp.float32
    back = gp.transpose(0, 1, 3, 2).reshape(2, 256, 64)
    np.testing.assert_array_equal(
        np.asarray(back, np.float32), np.asarray(g, np.float32)
    )
    # values remain exactly bf16-representable (lossless downcast)
    np.testing.assert_array_equal(
        np.asarray(gp.astype(jnp.bfloat16).astype(jnp.float32)),
        np.asarray(gp),
    )


def test_sort_queries_is_a_permutation_with_holes_last():
    _, _, _, nn = _mk()
    order, inv = jax.jit(fb._sort_queries)(nn)
    o, iv = np.asarray(order), np.asarray(inv)
    M = nn.shape[1]
    for b in range(nn.shape[0]):
        assert np.array_equal(np.sort(o[b]), np.arange(M))
        assert np.array_equal(o[b][iv[b]], np.arange(M))
        # all-hole queries sort last
        first_nn = np.asarray(nn)[b, :, 0]
        hole_positions = np.where(first_nn[o[b]] < 0)[0]
        if len(hole_positions):
            assert hole_positions.min() == M - len(hole_positions)


def test_module_xla_impl_unchanged():
    """GroupedBNReluMax default path is byte-stable across the refactor."""
    from pointcloudmatters_tpu.models.components.nn_utils import (
        GroupedBNReluMax,
    )

    src, query, W, nn = _mk(D=64)
    g, h = src @ W, query @ W
    mod = GroupedBNReluMax()
    vs = mod.init(jax.random.PRNGKey(0), g, h, nn, use_running_average=False)
    out, upd = mod.apply(vs, g, h, nn, use_running_average=False,
                         mutable=["batch_stats"])
    assert out.shape == h.shape
    assert np.isfinite(np.asarray(out)).all()
    # stats updated away from init
    assert not np.allclose(
        np.asarray(upd["batch_stats"]["mean"]), 0.0
    )


def test_resolve_impl_gating(monkeypatch):
    from pointcloudmatters_tpu.models.components.nn_utils import (
        GroupedBNReluMax,
    )

    # on CPU always xla
    assert GroupedBNReluMax.resolve_impl(
        10240, 2048, 16, 512, jnp.bfloat16
    ) in ("xla", "fused")
    if jax.default_backend() != "tpu":
        assert GroupedBNReluMax.resolve_impl(
            10240, 2048, 16, 512, jnp.bfloat16
        ) == "xla"
    # f32 never fused
    assert GroupedBNReluMax.resolve_impl(
        10240, 2048, 16, 512, jnp.float32
    ) == "xla"
    # unsupported shapes never fused
    assert not fb.fused_builder_supported(10240, 2048, 17, 512)
    assert not fb.fused_builder_supported(10240, 2048, 16, 72)
    assert not fb.fused_builder_supported(200000, 2048, 16, 512)
    monkeypatch.setenv("PCM_BUILDER_IMPL", "xla")
    assert GroupedBNReluMax.resolve_impl(
        10240, 2048, 16, 512, jnp.bfloat16
    ) == "xla"

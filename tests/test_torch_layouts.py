"""Unit tests for the shared torch->flax weight-layout contract
(utils/torch_layouts.py) — the single copy every porter consumes."""

from __future__ import annotations

import numpy as np

from pointcloudmatters_tpu.utils import torch_layouts as TL


def test_linear_roundtrip():
    w = np.arange(12.0).reshape(3, 4)  # (out, in)
    k = TL.linear_kernel(w)
    assert k.shape == (4, 3)
    x = np.random.RandomState(0).randn(5, 4)
    np.testing.assert_allclose(x @ k, x @ w.T)


def test_conv1d_layouts():
    w = np.random.RandomState(1).randn(8, 3, 5)  # (out, in, k)
    assert TL.conv1d_kernel(w).shape == (5, 3, 8)
    w1 = w[:, :, :1]
    np.testing.assert_allclose(TL.conv1d_k1_kernel(w1), w1[:, :, 0].T)


def test_conv2d_layouts():
    w = np.random.RandomState(2).randn(8, 3, 7, 7)  # OIHW
    assert TL.conv2d_kernel(w).shape == (7, 7, 3, 8)  # HWIO
    w1 = w[:, :, :1, :1]
    np.testing.assert_allclose(TL.conv2d_k1_kernel(w1), w1[:, :, 0, 0].T)


def test_conv_transpose1d_flip():
    w = np.random.RandomState(3).randn(3, 8, 4)  # (in, out, k)
    k = TL.conv_transpose1d_kernel(w)
    assert k.shape == (4, 3, 8)
    # spatial axis flipped: k[j] corresponds to torch kernel position K-1-j
    np.testing.assert_allclose(k[0], w[:, :, 3])
    np.testing.assert_allclose(k[3], w[:, :, 0])


def test_spconv_k1():
    w = np.random.RandomState(4).randn(16, 1, 1, 1, 6)
    np.testing.assert_allclose(TL.spconv_k1_kernel(w), w[:, 0, 0, 0, :].T)
    try:
        TL.spconv_k1_kernel(np.zeros((4, 3, 3, 3, 2)))
        raise AssertionError("should reject k>1 weights")
    except ValueError:
        pass


def test_mha_split_matches_torch_math():
    """q/k/v projections through the split kernels equal torch's packed
    in_proj, and the out projection composes identically."""
    rng = np.random.RandomState(5)
    D, H = 8, 2
    dh = D // H
    w = rng.randn(3 * D, D).astype(np.float64)
    b = rng.randn(3 * D).astype(np.float64)
    x = rng.randn(4, D)

    tree = TL.mha_in_proj(w, b, H)
    for i, name in enumerate(("query", "key", "value")):
        torch_out = x @ w[i * D:(i + 1) * D].T + b[i * D:(i + 1) * D]
        flax_out = (
            np.einsum("nd,dhk->nhk", x, tree[name]["kernel"])
            + tree[name]["bias"]
        ).reshape(4, D)
        np.testing.assert_allclose(flax_out, torch_out)

    wo = rng.randn(D, D)
    bo = rng.randn(D)
    out = TL.mha_out_proj(wo, bo, H)
    heads = rng.randn(4, H, dh)
    torch_out = heads.reshape(4, D) @ wo.T + bo
    flax_out = np.einsum("nhk,hkd->nd", heads, out["kernel"]) + out["bias"]
    np.testing.assert_allclose(flax_out, torch_out)

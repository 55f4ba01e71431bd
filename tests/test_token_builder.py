"""GroupedBNReluMax — fused token-builder exactness vs the unfused chain.

The fused module claims bit-exact equality with
``max_k(relu(MaskedBatchNorm(where(hole, 0, g[nn] - h))))`` (reference
`act/act.py:457-460`). These tests check outputs AND running-statistics
updates against the unfused formulation, including hole indices, all-hole
rows, negative/zero BN scales, and eval mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from pointcloudmatters_tpu.models.components.nn_utils import (
    GroupedBNReluMax,
    MaskedBatchNorm,
)
from pointcloudmatters_tpu.ops.pointops import gather_rows_padded

B, N, M, K, D = 3, 64, 16, 8, 24


class _Unfused(nn.Module):
    @nn.compact
    def __call__(self, g, h, nn_idx, use_running_average=True):
        gg = gather_rows_padded(g, nn_idx)
        x = jnp.where((nn_idx < 0)[..., None], 0.0, gg - h[:, :, None, :])
        x = MaskedBatchNorm(name="bn")(x, use_running_average=use_running_average)
        return jnp.max(jax.nn.relu(x), axis=2)


def _data(seed=0, holes=True, dtype=jnp.bfloat16):
    rng = np.random.RandomState(seed)
    g = jnp.asarray(rng.randn(B, N, D), dtype)
    h = jnp.asarray(rng.randn(B, M, D), dtype)
    idx = rng.randint(0, N, (B, M, K))
    if holes:
        idx[rng.rand(B, M, K) < 0.2] = -1
        idx[0, 0, :] = -1  # one all-hole row
    return g, h, jnp.asarray(idx, jnp.int32)


def _vars(seed=1):
    """Shared scale/bias/stats with negative, zero, and positive scales."""
    rng = np.random.RandomState(seed)
    scale = rng.randn(D).astype(np.float32)
    scale[0] = 0.0
    scale[1] = -2.0
    return {
        "params": {"bn": {"scale": jnp.asarray(scale),
                          "bias": jnp.asarray(rng.randn(D).astype(np.float32))}},
        "batch_stats": {"bn": {
            "mean": jnp.asarray(rng.randn(D).astype(np.float32) * 0.1),
            "var": jnp.asarray(rng.rand(D).astype(np.float32) + 0.5),
        }},
    }


def _fused_vars(v):
    # GroupedBNReluMax owns its variables directly (no inner module scope)
    return {"params": v["params"]["bn"], "batch_stats": v["batch_stats"]["bn"]}


@pytest.mark.parametrize("holes", [False, True])
@pytest.mark.parametrize("train", [False, True])
def test_fused_matches_unfused(holes, train):
    g, h, idx = _data(holes=holes)
    v = _vars()
    ref_mod, fused_mod = _Unfused(), GroupedBNReluMax()

    ref, ref_upd = ref_mod.apply(
        v, g, h, idx, use_running_average=not train, mutable=["batch_stats"]
    )
    out, upd = fused_mod.apply(
        _fused_vars(v), g, h, idx, use_running_average=not train,
        mutable=["batch_stats"],
    )
    # bit-exact output (monotone-rounding argument in the module docstring)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    if train:
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(ref_upd["batch_stats"]["bn"][k]),
                np.asarray(upd["batch_stats"][k]),
                rtol=1e-6, atol=1e-6,
            )


def _grad_vars():
    """Like _vars() but without the exact-zero scale: at eff_scale == 0 the
    max-of-affine-maps is nonsmooth in scale, and the fused module's
    subgradient convention (extremum picked before the affine map) legitimately
    differs from autodiff's even split over the K-way tie in the unfused
    chain. Gradient tests avoid the measure-zero nondifferentiable point;
    forward tests keep it."""
    v = _vars()
    v["params"]["bn"]["scale"] = v["params"]["bn"]["scale"].at[0].set(0.37)
    return v


def test_fused_gradients_match():
    """f32 gradients agree with the unfused chain (same math, fused reads)."""
    g, h, idx = _data(dtype=jnp.float32)
    v = _grad_vars()

    def loss_ref(params, g, h):
        out = _Unfused().apply(
            {"params": {"bn": params},
             "batch_stats": {"bn": v["batch_stats"]["bn"]}},
            g, h, idx, use_running_average=False, mutable=["batch_stats"])[0]
        return jnp.sum(out ** 2)

    def loss_fused(params, g, h):
        out = GroupedBNReluMax().apply(
            {"params": params, "batch_stats": v["batch_stats"]["bn"]},
            g, h, idx, use_running_average=False, mutable=["batch_stats"])[0]
        return jnp.sum(out ** 2)

    p = v["params"]["bn"]
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(p, g, h)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(p, g, h)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_cross_replica_gradients_match():
    """Sharded (axis_name + psum stats) gradients equal full-batch gradients.

    The fused module psums its batch statistics when ``axis_name`` is set
    (sync-BN); this asserts that the backward coupling between shards through
    the shared statistics is exact.
    """
    g, h, idx = _data(holes=True, dtype=jnp.float32)
    v = _fused_vars(_grad_vars())

    def loss_full(g, h):
        out = GroupedBNReluMax().apply(
            v, g, h, idx, use_running_average=False, mutable=["batch_stats"])[0]
        return jnp.sum(out ** 2)

    def loss_sharded(g, h):
        def shard_fn(g, h, idx):
            out = GroupedBNReluMax(axis_name="d").apply(
                v, g, h, idx, use_running_average=False,
                mutable=["batch_stats"])[0]
            return jnp.sum(out ** 2)

        return jnp.sum(jax.vmap(shard_fn, axis_name="d")(
            g[:, None], h[:, None], idx[:, None]))

    gr = jax.grad(loss_full, argnums=(0, 1))(g, h)
    gs = jax.grad(loss_sharded, argnums=(0, 1))(g, h)
    for a, b in zip(gr, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_cross_replica_stats_psum():
    """axis_name statistics equal the single-device stats over the full batch."""
    g, h, idx = _data(holes=False, dtype=jnp.float32)
    v = _fused_vars(_vars())

    out_full, upd_full = GroupedBNReluMax().apply(
        v, g, h, idx, use_running_average=False, mutable=["batch_stats"])

    def shard_fn(g, h, idx):
        return GroupedBNReluMax(axis_name="d").apply(
            v, g, h, idx, use_running_average=False, mutable=["batch_stats"])

    # vmap over a leading device axis of size B with psum = sync BN
    outs, upds = jax.vmap(shard_fn, axis_name="d")(
        g[:, None], h[:, None], idx[:, None])
    np.testing.assert_allclose(np.asarray(outs[:, 0]), np.asarray(out_full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(upds["batch_stats"]["mean"][0]),
        np.asarray(upd_full["batch_stats"]["mean"]), rtol=1e-5, atol=1e-5)

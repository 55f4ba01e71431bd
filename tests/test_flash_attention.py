"""Flash-attention-with-dropout kernel tests (TPU-only; CI forces CPU).

Validation strategy: the in-kernel dropout mask is *extracted* from the
forward kernel itself — with q = 0 every softmax probability is 1/L, so
running v = L·I through the kernel returns exactly D/keep — and then fwd and
all grads are compared against a dense reference using that same mask.
Residual error must be statistically indistinguishable from a pure
matmul-precision yardstick (the same dense math with one-pass bf16 matmuls,
which is what the MXU does to f32 inputs at default precision).

Run on the chip: PCM_TEST_TPU=1 python -m pytest tests/test_flash_attention.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

on_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernels are TPU-only"
)

B, H, L, D = 2, 3, 1024, 128
RATE = 0.1


def _setup():
    from pointcloudmatters_tpu.ops import flash_attention as FA

    bs = FA.BlockSizes(
        block_q=512, block_k_major=512, block_k=512, block_b=1,
        block_q_major_dkv=512, block_k_major_dkv=512,
        block_k_dkv=512, block_q_dkv=512,
        block_k_major_dq=512, block_k_dq=512, block_q_dq=512,
    )
    rng = np.random.RandomState(0)
    q, k, v, w = (
        jnp.asarray(rng.randn(B, H, L, D), jnp.float32) for _ in range(4)
    )
    seed = jnp.asarray([42], jnp.int32)
    scale = 1.0 / np.sqrt(D)
    return FA, bs, q, k, v, w, seed, scale


def _extract_mask(FA, bs, seed, scale):
    """Recover the binary dropout mask the kernel actually applied."""
    qz = jnp.zeros((1, 1, L, 512), jnp.float32)
    eye = np.eye(L, dtype=np.float32) * L
    cols = []
    for c0 in range(0, L, 512):  # identity stripes keep head_dim VMEM-sized
        vi = jnp.asarray(eye[:, c0 : c0 + 512])[None, None]
        om = FA.flash_attention(
            qz, qz, vi, causal=False, sm_scale=scale,
            dropout_rate=RATE, dropout_seed=seed, block_sizes=bs,
        )
        cols.append(np.asarray(om[0, 0]))
    return np.concatenate(cols, axis=1) != 0


@on_tpu
class TestFlashDropout:
    def test_no_dropout_matches_reference(self):
        FA, bs, q, k, v, _, _, scale = _setup()
        o = FA.flash_attention(q, k, v, causal=False, sm_scale=scale,
                               block_sizes=bs)
        oref = FA.mha_reference_no_custom_vjp(q, k, v, causal=False,
                                              sm_scale=scale)
        assert float(jnp.abs(o - oref).max()) < 2e-2  # ref runs bf16 matmuls

    def test_deterministic_and_seed_sensitive(self):
        FA, bs, q, k, v, _, seed, scale = _setup()
        f = functools.partial(
            FA.flash_attention, causal=False, sm_scale=scale,
            dropout_rate=RATE, block_sizes=bs,
        )
        oa = f(q, k, v, dropout_seed=seed)
        assert bool(jnp.all(oa == f(q, k, v, dropout_seed=seed)))
        assert float(jnp.mean(oa != f(q, k, v, dropout_seed=seed + 1))) > 0.99

    def test_mask_is_bernoulli_at_rate(self):
        FA, bs, q, k, v, w, seed, scale = _setup()
        mask = _extract_mask(FA, bs, seed, scale)
        assert abs((~mask).mean() - RATE) < 0.01

    def test_fwd_and_grads_match_dense_with_same_mask(self):
        FA, bs, q, k, v, w, seed, scale = _setup()
        keep = jnp.asarray(
            _extract_mask(FA, bs, seed, scale).astype(np.float32) / (1 - RATE)
        )

        def dense(q, k, v, prec):
            with jax.default_matmul_precision(prec):
                s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
                p = jax.nn.softmax(s, axis=-1)
                return jnp.einsum("bhqk,bhkd->bhqd", p * keep[None, None], v)

        f = functools.partial(
            FA.flash_attention, causal=False, sm_scale=scale,
            dropout_rate=RATE, dropout_seed=seed, block_sizes=bs,
        )
        of, ohi, olo = f(q, k, v), dense(q, k, v, "highest"), dense(q, k, v, "bfloat16")
        # flash error vs a full-precision reference must look like pure
        # one-pass-bf16 matmul noise — any mask misalignment would be O(1)
        assert float(jnp.abs(of - ohi).mean()) < 2 * float(jnp.abs(olo - ohi).mean())
        assert float(jnp.abs(of - ohi).max()) < 3 * float(jnp.abs(olo - ohi).max())

        gf = jax.grad(lambda *a: jnp.sum(f(*a) * w), (0, 1, 2))(q, k, v)
        ghi = jax.grad(lambda *a: jnp.sum(dense(*a, "highest") * w), (0, 1, 2))(q, k, v)
        glo = jax.grad(lambda *a: jnp.sum(dense(*a, "bfloat16") * w), (0, 1, 2))(q, k, v)
        for name, a, hi, lo in zip("qkv", gf, ghi, glo):
            e, y = jnp.abs(a - hi), jnp.abs(lo - hi)
            assert float(e.mean()) < 2 * float(y.mean()), name
            assert float(e.max()) < 3 * float(y.max()), name

    def test_segment_ids_with_dropout(self):
        FA, bs, q, k, v, w, seed, scale = _setup()
        keep = jnp.asarray(
            _extract_mask(FA, bs, seed, scale).astype(np.float32) / (1 - RATE)
        )
        kv_valid = np.arange(L) < 900
        si = FA.SegmentIds(
            q=jnp.ones((B, L), jnp.int32),
            kv=jnp.tile(jnp.asarray(kv_valid, jnp.int32)[None], (B, 1)),
        )

        def dense(q, k, v, prec):
            with jax.default_matmul_precision(prec):
                s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
                s = jnp.where(
                    jnp.asarray(kv_valid)[None, None, None, :],
                    s, FA.DEFAULT_MASK_VALUE,
                )
                p = jax.nn.softmax(s, axis=-1)
                return jnp.einsum("bhqk,bhkd->bhqd", p * keep[None, None], v)

        f = functools.partial(
            FA.flash_attention, segment_ids=si, causal=False, sm_scale=scale,
            dropout_rate=RATE, dropout_seed=seed, block_sizes=bs,
        )
        of, ohi, olo = f(q, k, v), dense(q, k, v, "highest"), dense(q, k, v, "bfloat16")
        assert float(jnp.abs(of - ohi).mean()) < 2 * float(jnp.abs(olo - ohi).mean())
        gf = jax.grad(lambda *a: jnp.sum(f(*a) * w), (0, 1, 2))(q, k, v)
        ghi = jax.grad(lambda *a: jnp.sum(dense(*a, "highest") * w), (0, 1, 2))(q, k, v)
        glo = jax.grad(lambda *a: jnp.sum(dense(*a, "bfloat16") * w), (0, 1, 2))(q, k, v)
        for name, a, hi, lo in zip("qkv", gf, ghi, glo):
            assert float(jnp.abs(a - hi).mean()) < 2 * float(jnp.abs(lo - hi).mean()), name


class TestAdapterFallback:
    """CPU-runnable: the flax adapter must route to dense off-TPU and for
    short sequences, bit-matching nn.dot_product_attention."""

    def test_dense_fallback_matches_flax(self):
        from flax import linen as nn
        from pointcloudmatters_tpu.ops.attention import make_flash_attention_fn

        rng = np.random.RandomState(0)
        q, k, v = (jnp.asarray(rng.randn(2, 64, 4, 16), jnp.float32)
                   for _ in range(3))
        fn = make_flash_attention_fn()
        got = fn(q, k, v, deterministic=True)
        want = nn.dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_mha_module_parity_dense_vs_flash_config(self):
        """Off-TPU, attention_impl='flash' layers must equal dense ones
        parameter-for-parameter (the adapter falls back)."""
        from pointcloudmatters_tpu.models.components.act.transformer import (
            TransformerEncoderLayer,
        )

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 40, 32), jnp.float32)
        la = TransformerEncoderLayer(d_model=32, nhead=4, dim_feedforward=64,
                                     attention_impl="dense")
        lb = TransformerEncoderLayer(d_model=32, nhead=4, dim_feedforward=64,
                                     attention_impl="flash")
        params = la.init(jax.random.key(0), x, deterministic=True)
        oa = la.apply(params, x, deterministic=True)
        ob = lb.apply(params, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-6)

"""ops/fused_mha.py TPU tests — one-kernel layer-attention forward.

Part of bench.py's pre-timing gate since round 5: every kernel the step can
route through (including the opt-in attention_impl="fused" backend) is
verified on-chip before a throughput number is recorded.
Run: PCM_TEST_TPU=1 python -m pytest tests/test_fused_mha_tpu.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

on_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernels are TPU-only"
)


@on_tpu
class TestFusedMHA:
    """ops/fused_mha.py — one-kernel layer-attention forward."""

    def _inputs(self, B=4, L=1024, D=512, H=8, seed=0):
        rng = np.random.RandomState(seed)
        x_qk = jnp.asarray(rng.randn(B, L, D) * 0.5, jnp.bfloat16)
        x_v = jnp.asarray(rng.randn(B, L, D) * 0.5, jnp.bfloat16)
        mk = lambda: jnp.asarray(rng.randn(D, D) * 0.03, jnp.bfloat16)
        vb = lambda: jnp.asarray(rng.randn(D) * 0.03, jnp.bfloat16)
        return x_qk, x_v, mk(), vb(), mk(), vb(), mk(), vb(), mk(), vb()

    def _composed(self, x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, H=8):
        from pointcloudmatters_tpu.ops.oneshot_attention import (
            oneshot_attention,
        )

        B, L, D = x_qk.shape
        DH = D // H
        to_bhld = lambda t: t.reshape(B, L, H, DH).transpose(0, 2, 1, 3)
        q = to_bhld(x_qk @ wq + bq)
        k = to_bhld(x_qk @ wk + bk)
        v = to_bhld(x_v @ wv + bv)
        o = oneshot_attention(q, k, v, jnp.zeros((1,), jnp.int32),
                              DH ** -0.5, 0.0)
        return o.transpose(0, 2, 1, 3).reshape(B, L, D) @ wo + bo

    def test_forward_matches_composed(self):
        from pointcloudmatters_tpu.ops.fused_mha import fused_mha

        args = self._inputs()
        got = jax.jit(lambda *a: fused_mha(
            *a, jnp.zeros((1,), jnp.int32), 8, 0.0))(*args)
        ref = jax.jit(self._composed)(*args)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-2,
        )

    def test_grads_match_composed(self):
        from pointcloudmatters_tpu.ops.fused_mha import fused_mha

        args = self._inputs(B=2, L=512)

        def loss_fused(*a):
            return jnp.sum(fused_mha(
                *a, jnp.zeros((1,), jnp.int32), 8, 0.0
            ).astype(jnp.float32) ** 2)

        def loss_comp(*a):
            return jnp.sum(self._composed(*a).astype(jnp.float32) ** 2)

        g1 = jax.jit(jax.grad(loss_fused, argnums=tuple(range(10))))(*args)
        g2 = jax.jit(jax.grad(loss_comp, argnums=tuple(range(10))))(*args)
        for a, b in zip(g1, g2):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            sc = max(1.0, np.abs(b).max())
            assert np.abs(a - b).max() / sc < 3e-2, np.abs(a - b).max() / sc

    def test_dropout_deterministic_per_seed(self):
        from pointcloudmatters_tpu.ops.fused_mha import fused_mha

        args = self._inputs(B=2, L=512)
        f = jax.jit(lambda s, *a: fused_mha(*a, s, 8, 0.1))
        s1 = jnp.asarray([123], jnp.int32)
        s2 = jnp.asarray([124], jnp.int32)
        o_a = f(s1, *args)
        o_b = f(s1, *args)
        o_c = f(s2, *args)
        np.testing.assert_array_equal(np.asarray(o_a), np.asarray(o_b))
        assert np.abs(np.asarray(o_a, np.float32)
                      - np.asarray(o_c, np.float32)).max() > 0

"""ops/fused_builder.py TPU tests — the Pallas fused token builder.

These run in bench.py's pre-timing gate (the fused builder IS the default
training path on TPU under mixed precision): a regression here must abort
the throughput bench rather than skew it.
Run: PCM_TEST_TPU=1 python -m pytest tests/test_fused_builder_tpu.py
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointcloudmatters_tpu.ops import fused_builder as fb

on_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernels are TPU-only"
)


def _mk(seed=0, B=4, N=1280, M=256, K=16, D=256, local=True):
    """bf16 inputs with kNN-like local indices plus edge cases."""
    rng = np.random.RandomState(seed)
    g = jnp.asarray(rng.randn(B, N, D) * 0.4, jnp.bfloat16)
    h = jnp.asarray(rng.randn(B, M, D) * 0.2, jnp.bfloat16)
    if local:  # sorted random-walk centers: Morton-like locality
        center = np.sort(rng.randint(0, N, (B, M)))
        nn = np.clip(center[..., None] + rng.randint(-64, 64, (B, M, K)),
                     0, N - 1).astype(np.int32)
    else:
        nn = rng.randint(0, N, (B, M, K)).astype(np.int32)
    nn[:, -8:, :] = -1             # all-hole (padding) queries
    nn[0, 3, 5:] = nn[0, 3, 0]     # duplicate neighbors -> exact ties
    nn[1, 7, ::2] = -1             # partial holes
    return g, h, jnp.asarray(nn)


@on_tpu
class TestFusedBuilderForward:
    @pytest.mark.parametrize("local", [True, False])
    def test_bit_exact_vs_xla_core(self, local):
        g, h, nn = _mk(local=local)
        outp = jax.jit(fb._sorted_core)(g, h, nn)
        outx = jax.jit(fb._core_xla)(g, h, nn)
        names = ("vmax", "vmin", "sg", "bm")
        for name, a, b in zip(names, outp[:4], outx[:4]):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            np.testing.assert_array_equal(a, b, err_msg=name)
        for name, a, b in zip(("total", "total_sq"), outp[4:], outx[4:]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, err_msg=name
            )

    def test_unpadded_m_and_small_n(self):
        # M not a multiple of 128 exercises the pad/sort/unsort path
        g, h, nn = _mk(B=2, N=256, M=192, D=128)
        outp = jax.jit(fb._sorted_core)(g, h, nn)
        outx = jax.jit(fb._core_xla)(g, h, nn)
        np.testing.assert_array_equal(
            np.asarray(outp[0], np.float32), np.asarray(outx[0], np.float32)
        )

    def test_permutation_invariance(self):
        """Results must not depend on the (duplicate-key) query sort."""
        g, h, nn = _mk(B=2)
        base = np.asarray(jax.jit(fb._sorted_core)(g, h, nn)[0], np.float32)
        rng = np.random.RandomState(7)
        perm = jnp.asarray(
            np.stack([rng.permutation(nn.shape[1]) for _ in range(2)]),
            jnp.int32,
        )
        nn_p = jnp.take_along_axis(nn, perm[..., None], axis=1)
        h_p = jnp.take_along_axis(h, perm[..., None], axis=1)
        out_p = np.asarray(jax.jit(fb._sorted_core)(g, h_p, nn_p)[0],
                           np.float32)
        unperm = np.empty_like(out_p)
        for b in range(2):
            unperm[b][np.asarray(perm)[b]] = out_p[b]
        np.testing.assert_array_equal(unperm, base)


@on_tpu
class TestFusedBuilderBackward:
    def _loss(self, outs, cvec):
        vmax, vmin, total, total_sq = outs
        vmax = jnp.where(jnp.isfinite(vmax), vmax, 0)
        vmin = jnp.where(jnp.isfinite(vmin), vmin, 0)
        return (jnp.sum(vmax.astype(jnp.float32) * cvec)
                + jnp.sum(vmin.astype(jnp.float32) * (cvec + 0.3))
                + jnp.sum(total) * 1e-3 + jnp.sum(total_sq) * 1e-4)

    def test_core_boundary_pallas_matches_xla_impl(self):
        g, h, nn = _mk()
        rng = np.random.RandomState(1)
        cvec = jnp.asarray(rng.randn(*h.shape) * 0.1, jnp.float32)
        grads = {}
        for impl in ("pallas", "xla"):
            grads[impl] = jax.jit(jax.grad(
                lambda g, h, impl=impl: self._loss(
                    fb.grouped_stats_core(g, h, nn, impl=impl), cvec
                ),
                argnums=(0, 1),
            ))(g, h)
        for a, b, name in zip(grads["pallas"], grads["xla"], ("dg", "dh")):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = np.abs(a - b).max() / max(1e-6, np.abs(b).max())
            assert rel < 2e-2, (name, rel)

    def test_data_boundary_pallas_matches_xla_impl(self):
        rng = np.random.RandomState(2)
        B, N, M, K, D = 4, 1280, 256, 16, 256
        src = jnp.asarray(rng.randn(B, N, 9) * 0.4, jnp.bfloat16)
        query = jnp.asarray(rng.randn(B, M, 9) * 0.4, jnp.bfloat16)
        W0 = jnp.asarray(rng.randn(9, D) * 0.1, jnp.bfloat16)
        _, _, nn = _mk(B=B, N=N, M=M, D=D)
        cvec = jnp.asarray(rng.randn(B, M, D) * 0.1, jnp.float32)
        grads = {}
        for impl in ("pallas", "xla"):
            grads[impl] = jax.jit(jax.grad(
                lambda W, impl=impl: self._loss(
                    fb.grouped_stats_data(src, W, query @ W, nn, impl=impl),
                    cvec,
                )
            ))(W0)
        a = np.asarray(grads["pallas"], np.float32)
        b = np.asarray(grads["xla"], np.float32)
        rel = np.abs(a - b).max() / max(1.0, np.abs(b).max())
        assert rel < 1e-3, rel


@on_tpu
class TestModuleIntegration:
    def test_module_fused_data_matches_xla_path(self):
        """The scatter-free data-boundary path through GroupedBNReluMax."""
        from pointcloudmatters_tpu.models.components.nn_utils import (
            GroupedBNReluMax,
        )

        rng = np.random.RandomState(5)
        B, N, M, K, D = 2, 1280, 256, 16, 128
        src = jnp.asarray(rng.randn(B, N, 9) * 0.4, jnp.bfloat16)
        query = jnp.asarray(rng.randn(B, M, 9) * 0.4, jnp.bfloat16)
        W = jnp.asarray(rng.randn(9, D) * 0.1, jnp.bfloat16)
        _, _, nn = _mk(B=B, N=N, M=M, D=D)
        g, h = (src @ W).astype(jnp.bfloat16), (query @ W).astype(jnp.bfloat16)
        mod = GroupedBNReluMax()
        vs = mod.init(jax.random.PRNGKey(0), g, h, nn,
                      use_running_average=False)
        out_ref, upd_ref = mod.apply(
            vs, g, h, nn, use_running_average=False, mutable=["batch_stats"]
        )
        out_f, upd_f = mod.apply(
            vs, None, h, nn, use_running_average=False,
            src=src, W=W, impl="fused_data", mutable=["batch_stats"],
        )
        np.testing.assert_allclose(
            np.asarray(out_f, np.float32), np.asarray(out_ref, np.float32),
            atol=1e-2, rtol=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(upd_f["batch_stats"]["mean"]),
            np.asarray(upd_ref["batch_stats"]["mean"]), rtol=1e-3, atol=1e-5,
        )

    def test_module_fused_core_matches_xla_path(self):
        from pointcloudmatters_tpu.models.components.nn_utils import (
            GroupedBNReluMax,
        )

        g, h, nn = _mk(B=2, D=128)
        mod = GroupedBNReluMax()
        vs = mod.init(jax.random.PRNGKey(0), g, h, nn,
                      use_running_average=False)
        out_ref, upd_ref = mod.apply(
            vs, g, h, nn, use_running_average=False, mutable=["batch_stats"]
        )
        out_f, upd_f = mod.apply(
            vs, g, h, nn, use_running_average=False, impl="fused_core",
            mutable=["batch_stats"],
        )
        np.testing.assert_allclose(
            np.asarray(out_f, np.float32), np.asarray(out_ref, np.float32),
            atol=1e-2, rtol=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(upd_f["batch_stats"]["mean"]),
            np.asarray(upd_ref["batch_stats"]["mean"]), rtol=1e-3,
        )

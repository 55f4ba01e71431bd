"""Attention-core microbench at flagship shapes (B=32, H=8, L=2051, Dh=64).

Compares dense/flash/splash formulations fwd+bwd in bf16 to pick the ACT
encoder's attention backend. Not part of the test suite.

Run: python -u scripts/bench_attention.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

B, H, L, Dh = 32, 8, 2051, 64


def timeit(name, fn, *args, warmup=2, iters=10):
    try:
        for _ in range(warmup):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:56s} {dt:8.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:56s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return float("inf")


def main():
    print(f"backend={jax.default_backend()} prng={jax.config.jax_default_prng_impl}",
          flush=True)
    jax.config.update("jax_default_prng_impl", "rbg")
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, L, H, Dh).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, L, H, Dh).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, L, H, Dh).astype(np.float32), jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    def loss_of(att_fn, *a):
        return jnp.sum(att_fn(*a).astype(jnp.float32) ** 2)

    # --- dense (flax) deterministic ---
    def dense_det(q, k, v):
        return nn.dot_product_attention(q, k, v, deterministic=True)

    timeit("dense det fwd", jax.jit(dense_det), q, k, v)
    timeit("dense det fwd+bwd",
           jax.jit(jax.grad(functools.partial(loss_of, dense_det),
                            argnums=(0, 1, 2))), q, k, v)

    # --- dense with broadcast dropout (rbg) ---
    def dense_drop(q, k, v):
        return nn.dot_product_attention(
            q, k, v, dropout_rng=key, dropout_rate=0.1,
            broadcast_dropout=True, deterministic=False)

    timeit("dense drop0.1 fwd+bwd",
           jax.jit(jax.grad(functools.partial(loss_of, dense_drop),
                            argnums=(0, 1, 2))), q, k, v)

    # --- flash kernel, block-size sweep ---
    from pointcloudmatters_tpu.ops.attention import make_flash_attention_fn

    for (bq, bk) in [(512, 512), (256, 512), (512, 1024), (1024, 512),
                     (1024, 1024), (128, 512), (256, 2048), (2048, 256)]:
        fa = make_flash_attention_fn(block_q=bq, block_k=bk, min_seq_len=0)

        def flash_det(q, k, v, fa=fa):
            return fa(q, k, v, deterministic=True)

        timeit(f"flash det bq={bq} bk={bk} fwd+bwd",
               jax.jit(jax.grad(functools.partial(loss_of, flash_det),
                                argnums=(0, 1, 2))), q, k, v)

    for (bq, bk) in [(512, 512), (512, 1024), (1024, 1024), (256, 512)]:
        fa = make_flash_attention_fn(block_q=bq, block_k=bk, min_seq_len=0)

        def flash_drop(q, k, v, fa=fa):
            return fa(q, k, v, dropout_rng=key, dropout_rate=0.1,
                      broadcast_dropout=True, deterministic=False)

        timeit(f"flash drop0.1 bq={bq} bk={bk} fwd+bwd",
               jax.jit(jax.grad(functools.partial(loss_of, flash_drop),
                                argnums=(0, 1, 2))), q, k, v)

    # --- one-shot whole-row kernel ---
    from pointcloudmatters_tpu.ops.oneshot_attention import oneshot_attention

    seed = jnp.zeros((1,), jnp.int32)
    for bq in (128, 256, 512):
        def oneshot_det(q, k, v, bq=bq):
            qq, kk, vv = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
            out = oneshot_attention(qq, kk, vv, seed, Dh ** -0.5, 0.0, bq)
            return jnp.swapaxes(out, 1, 2)

        timeit(f"oneshot det bq={bq} fwd", jax.jit(oneshot_det), q, k, v)
        timeit(f"oneshot det bq={bq} fwd+bwd",
               jax.jit(jax.grad(functools.partial(loss_of, oneshot_det),
                                argnums=(0, 1, 2))), q, k, v)

    # correctness vs dense (deterministic)
    ref = jax.jit(dense_det)(q, k, v)
    got = jax.jit(lambda q, k, v: jnp.swapaxes(
        oneshot_attention(*(jnp.swapaxes(x, 1, 2) for x in (q, k, v)),
                          seed, Dh ** -0.5, 0.0, 256), 1, 2))(q, k, v)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    print(f"oneshot vs dense maxabs: {float(err):.6f}", flush=True)
    rg = jax.jit(jax.grad(functools.partial(loss_of, dense_det), argnums=(0,)))(q, k, v)
    def oneshot_det2(q, k, v):
        qq, kk, vv = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
        return jnp.swapaxes(oneshot_attention(qq, kk, vv, seed, Dh ** -0.5, 0.0, 256), 1, 2)
    gg = jax.jit(jax.grad(functools.partial(loss_of, oneshot_det2), argnums=(0,)))(q, k, v)
    gerr = jnp.max(jnp.abs(gg[0].astype(jnp.float32) - rg[0].astype(jnp.float32)))
    gref = jnp.max(jnp.abs(rg[0].astype(jnp.float32)))
    print(f"oneshot dq maxabs err: {float(gerr):.6f} (ref max {float(gref):.3f})",
          flush=True)

    for bq in (256, 512):
        def oneshot_drop(q, k, v, bq=bq):
            qq, kk, vv = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
            out = oneshot_attention(qq, kk, vv, jnp.ones((1,), jnp.int32),
                                    Dh ** -0.5, 0.1, bq)
            return jnp.swapaxes(out, 1, 2)

        timeit(f"oneshot drop0.1 bq={bq} fwd+bwd",
               jax.jit(jax.grad(functools.partial(loss_of, oneshot_drop),
                                argnums=(0, 1, 2))), q, k, v)

    # --- splash attention (jax pallas ops), deterministic ceiling ---
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        Lp = -(-L // 128) * 128

        def make_splash():
            mask = sm.MultiHeadMask(
                [sm.FullMask((Lp, Lp)) for _ in range(H)]
            )
            return sk.make_splash_mha(
                mask=mask, head_shards=1, q_seq_shards=1)

        splash = make_splash()

        def splash_det(q, k, v):
            # (B, L, H, D) -> (B, H, L, D), pad to 128
            def prep(x):
                x = jnp.swapaxes(x, 1, 2)
                return jnp.pad(x, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))
            qq, kk, vv = prep(q), prep(k), prep(v)
            scale = Dh ** -0.5
            out = jax.vmap(splash)(qq * scale, kk, vv)
            return jnp.swapaxes(out[:, :, :L, :], 1, 2)

        timeit("splash det fwd", jax.jit(splash_det), q, k, v)
        timeit("splash det fwd+bwd",
               jax.jit(jax.grad(functools.partial(loss_of, splash_det),
                                argnums=(0, 1, 2))), q, k, v)
    except Exception as e:  # noqa: BLE001
        print(f"splash unavailable: {type(e).__name__}: {str(e)[:120]}",
              flush=True)


if __name__ == "__main__":
    main()

"""Micro-benchmarks round 2: scatter variants + refactored token builder.

Run: python -u scripts/microbench2.py [scatter|tokens|transformer]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, N, M, K, C = 32, 10240, 2048, 16, 512


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
        print(f"{name:52s} {dt:8.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return float("inf")


def bench_scatter():
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, N, (B, M, K)).astype(np.int32))
    dx16 = jnp.asarray(rng.randn(B, M, K, C).astype(np.float32)).astype(jnp.bfloat16)
    dx32 = dx16.astype(jnp.float32)

    def scat_at(dx, idx):
        out = jnp.zeros((B, N, C), dx.dtype)
        flat_idx = idx.reshape(B, M * K)
        return jax.vmap(lambda o, i, d: o.at[i].add(d))(
            out, flat_idx, dx.reshape(B, M * K, C)
        )

    def scat_flat(dx, idx):
        out = jnp.zeros((B * N, C), dx.dtype)
        off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        fi = (idx + off).reshape(-1)
        return out.at[fi].add(dx.reshape(-1, C))

    def scat_perk(dx, idx):
        out = jnp.zeros((B * N, C), dx.dtype)
        off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
        for k in range(K):
            fi = (idx[:, :, k] + off).reshape(-1)
            out = out.at[fi].add(dx[:, :, k].reshape(-1, C))
        return out

    def scat_segsum(dx, idx):
        off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        fi = (idx + off).reshape(-1)
        return jax.ops.segment_sum(dx.reshape(-1, C), fi, num_segments=B * N)

    def scat_sorted(dx, idx):
        off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        fi = (idx + off).reshape(-1)
        order = jnp.argsort(fi)
        fi_s = jnp.take(fi, order)
        dx_s = jnp.take(dx.reshape(-1, C), order, axis=0)
        return jax.ops.segment_sum(dx_s, fi_s, num_segments=B * N,
                                   indices_are_sorted=True)

    timeit("scatter .at add f32", jax.jit(scat_at), dx32, idx)
    timeit("scatter .at add bf16", jax.jit(scat_at), dx16, idx)
    timeit("scatter flat f32", jax.jit(scat_flat), dx32, idx)
    timeit("scatter flat bf16", jax.jit(scat_flat), dx16, idx)
    timeit("scatter per-k f32", jax.jit(scat_perk), dx32, idx)
    timeit("segment_sum f32", jax.jit(scat_segsum), dx32, idx)
    timeit("sort+segment_sum(sorted) f32", jax.jit(scat_sorted), dx32, idx)
    timeit("sort+segment_sum(sorted) bf16", jax.jit(scat_sorted), dx16, idx)


def bench_tokens():
    """Refactored token builder end-to-end fwd+bwd in bf16 (what the real
    step will run after the linear-split refactor)."""
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(jnp.bfloat16)
    h = jnp.asarray(rng.randn(B, M, C).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, N, (B, M, K)).astype(np.int32))

    def gather_flat(g, idx):
        flat = g.reshape(B * N, C)
        off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        return jnp.take(flat, (idx + off).reshape(-1), axis=0).reshape(
            B, M, K, C
        )

    def token_loss(g, h, idx):
        x = gather_flat(g, idx) - h[:, :, None, :]
        # affine stand-in for BN (stats precomputed) + relu + max
        x = jax.nn.relu(x * 1.1 + 0.1)
        x = jnp.max(x, axis=2)
        return jnp.sum(x.astype(jnp.float32))

    timeit("token fwd bf16 (gather+sub+relu+max)",
           jax.jit(token_loss), g, h, idx)
    timeit("token fwd+bwd bf16", jax.jit(jax.grad(token_loss, argnums=(0, 1))),
           g, h, idx)

    # with true BN batch stats (two passes over the gathered tensor)
    def token_loss_bn(g, h, idx):
        x = gather_flat(g, idx) - h[:, :, None, :]
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(xf - mu), axis=(0, 1, 2))
        x = (x - mu.astype(x.dtype)) * jax.lax.rsqrt(var + 1e-5).astype(x.dtype)
        x = jax.nn.relu(x)
        x = jnp.max(x, axis=2)
        return jnp.sum(x.astype(jnp.float32))

    timeit("token fwd+bwd bf16 with batch-stats BN",
           jax.jit(jax.grad(token_loss_bn, argnums=(0, 1))), g, h, idx)


def bench_transformer():
    from pointcloudmatters_tpu.models.components.act.transformer import (
        Transformer,
    )

    impl = sys.argv[2] if len(sys.argv) > 2 else "dense"
    rng = np.random.RandomState(0)
    tr = Transformer(
        d_model=512, nhead=8, num_encoder_layers=4, num_decoder_layers=7,
        dim_feedforward=32, dropout=0.1, normalize_before=False,
        return_intermediate_dec=True, attention_impl=impl,
    )
    src = jnp.asarray(rng.rand(B, M, 512).astype(np.float32))
    latent = jnp.asarray(rng.rand(B, 512).astype(np.float32))
    proprio = jnp.asarray(rng.rand(B, 2, 512).astype(np.float32))
    qemb = jnp.asarray(rng.rand(100, 512).astype(np.float32))
    addpe = jnp.asarray(rng.rand(3, 512).astype(np.float32))
    pos = jnp.asarray(rng.rand(1, M, 512).astype(np.float32))
    trvars = tr.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        src[:2].astype(jnp.bfloat16), qemb, pos=pos,
        latent_input=latent[:2], proprio_input=proprio[:2],
        additional_pos_embed=addpe, deterministic=True,
    )

    def tr_loss(params, src):
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        hs = tr.apply(
            cast(params), cast(src), qemb.astype(jnp.bfloat16),
            pos=pos.astype(jnp.bfloat16),
            latent_input=latent.astype(jnp.bfloat16),
            proprio_input=proprio.astype(jnp.bfloat16),
            additional_pos_embed=addpe.astype(jnp.bfloat16),
            deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(hs[0].astype(jnp.float32) ** 2)

    timeit(f"transformer fwd+bwd bf16 ({impl}) L=2051",
           jax.jit(jax.grad(tr_loss)), trvars, src)

    def tr_eval(params, src):
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        hs = tr.apply(
            cast(params), cast(src), qemb.astype(jnp.bfloat16),
            pos=pos.astype(jnp.bfloat16),
            latent_input=latent.astype(jnp.bfloat16),
            proprio_input=proprio.astype(jnp.bfloat16),
            additional_pos_embed=addpe.astype(jnp.bfloat16),
            deterministic=True,
        )
        return hs[0]

    timeit(f"transformer fwd-only bf16 ({impl})", jax.jit(tr_eval), trvars, src)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "scatter"
    {"scatter": bench_scatter, "tokens": bench_tokens,
     "transformer": bench_transformer}[which]()

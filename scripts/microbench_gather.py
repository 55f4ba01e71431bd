"""Microbench: XLA gather formulations + token-builder backward variants.

Decides how GroupedBNReluMax computes its gradients: the measured XLA row
gather runs ~25x off HBM bandwidth, so the question is which formulation of
the gather/scatter pair XLA compiles best at flagship shapes
(B=32, N=10240, M=2048, K=16, D=512).

    python scripts/microbench_gather.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, N, M, K, D = 32, 10240, 2048, 16, 512


def timeit(name, fn, *args, warmup=2, iters=10):
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


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.randn(B, N, D).astype(np.float32), jnp.bfloat16)
    h = jnp.asarray(rng.randn(B, M, D).astype(np.float32), jnp.bfloat16)
    # Morton-local indices: neighbors of query m cluster around a random
    # center, mimicking the sorted-cloud layout the collate produces.
    centers = np.sort(rng.randint(0, N, size=(B, M)), axis=1)
    nn_np = centers[..., None] + rng.randint(-40, 40, size=(B, M, K))
    nn_np = np.clip(nn_np, 0, N - 1)
    nn_idx = jnp.asarray(nn_np, jnp.int32)

    # --- gather variants ---------------------------------------------------
    @jax.jit
    def g_take_along(g, idx):
        return jnp.take_along_axis(
            g, idx.reshape(B, M * K)[..., None], axis=1
        ).reshape(B, M, K, D)

    timeit("gather take_along_axis (B,M*K)", g_take_along, g, nn_idx)

    @jax.jit
    def g_flat(g, idx):
        flat = g.reshape(B * N, D)
        gi = idx.reshape(B, M * K) + (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
        return jnp.take(flat, gi.reshape(-1), axis=0).reshape(B, M, K, D)

    timeit("gather flat-index jnp.take", g_flat, g, nn_idx)

    @jax.jit
    def g_onehot_win(g, idx):
        # windowed one-hot matmul: block of 256 queries, window 2048 rows
        MB, W = 256, 2048
        nb = M // MB

        def per_b(gb, idxb):
            def per_blk(idxblk):  # (MB, K)
                start = jnp.clip(jnp.min(idxblk), 0, N - W)
                rel = idxblk.reshape(MB * K) - start  # in [0, W) if local
                oh = (
                    rel[:, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
                ).astype(jnp.bfloat16)
                win = jax.lax.dynamic_slice(gb, (start, 0), (W, D))
                return jnp.dot(oh, win, preferred_element_type=jnp.bfloat16)

            return jax.vmap(per_blk)(idxb.reshape(nb, MB, K)).reshape(M, K, D)

        return jax.vmap(per_b)(g, idx)

    timeit("gather windowed one-hot matmul", g_onehot_win, g, nn_idx)

    # --- fused reduce variants (fwd+bwd) ------------------------------------
    scale = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(D).astype(np.float32) * 0.1)
    eps = 1e-5

    def fused_current(g, h, scale, bias):
        """Round-2 GroupedBNReluMax forward (x = gather - h, then reduce)."""
        gg = g_take_along.__wrapped__(g, nn_idx)
        x = gg - h[:, :, None, :]
        xmax = jnp.max(x, axis=2)
        xmin = jnp.min(x, axis=2)
        total = jnp.sum(x, axis=(0, 1, 2), dtype=jnp.float32)
        total_sq = jnp.sum(x * x, axis=(0, 1, 2), dtype=jnp.float32)
        count = float(B * M * K)
        mean = total / count
        var = jnp.maximum(total_sq / count - mean * mean, 0.0)
        es = (scale * jax.lax.rsqrt(var + eps)).astype(x.dtype)
        eb = (bias - mean * scale * jax.lax.rsqrt(var + eps)).astype(x.dtype)
        sel = jnp.where(es >= 0, xmax, xmin)
        return jax.nn.relu(sel * es + eb)

    def fused_hcommuted(g, h, scale, bias):
        """h commuted out: reductions over gather(g) only; combine analytically.

        max_k(g[i_k]-h) = max_k(g[i_k]) - h;  sum_k(g[i_k]-h)^2 =
        sumsq_k - 2h*sum_k + K*h^2. The (B,M,K,D) tensor with h folded in
        never exists, so autodiff's backward re-gathers only g.
        """
        gg = g_take_along.__wrapped__(g, nn_idx)
        gmax = jnp.max(gg, axis=2)
        gmin = jnp.min(gg, axis=2)
        gsum = jnp.sum(gg, axis=2, dtype=jnp.float32)  # (B,M,D)
        gsumsq = jnp.sum(
            gg.astype(jnp.float32) * gg.astype(jnp.float32), axis=2
        )
        hf = h.astype(jnp.float32)
        total = jnp.sum(gsum - K * hf, axis=(0, 1))
        total_sq = jnp.sum(
            gsumsq - 2.0 * hf * gsum + K * hf * hf, axis=(0, 1)
        )
        count = float(B * M * K)
        mean = total / count
        var = jnp.maximum(total_sq / count - mean * mean, 0.0)
        es = (scale * jax.lax.rsqrt(var + eps)).astype(g.dtype)
        eb = (bias - mean * scale * jax.lax.rsqrt(var + eps)).astype(g.dtype)
        sel = jnp.where(es >= 0, gmax - h, gmin - h)
        return jax.nn.relu(sel * es + eb)

    def mk_loss(f):
        def loss(g, h, scale, bias):
            y = f(g, h, scale, bias)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

    timeit("fused current   fwd+bwd (autodiff)", mk_loss(fused_current), g, h, scale, bias)
    timeit("fused h-commuted fwd+bwd (autodiff)", mk_loss(fused_hcommuted), g, h, scale, bias)

    # numerical sanity: same forward
    ya = fused_current(g, h, scale, bias)
    yb = fused_hcommuted(g, h, scale, bias)
    print("fwd max diff:", float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))))


if __name__ == "__main__":
    main()

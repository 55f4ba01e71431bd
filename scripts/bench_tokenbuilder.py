"""Token-builder reformulation experiments at flagship shapes.

Current: materialize (B,M,K,D) gathered neighborhoods -> BN -> relu -> max_k.
Candidate: per-channel BN+relu is monotonic, so max_k(relu(bn(x))) needs only
per-token max/min/sum/sumsq of the gathered rows -> (B,M,D) tensors.

    python -u scripts/bench_tokenbuilder.py
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
    print(f"{name:58s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    from pointcloudmatters_tpu.ops.pointops import gather_rows_padded

    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.randn(B, N, D).astype(np.float32), jnp.bfloat16)
    h = jnp.asarray(rng.randn(B, M, D).astype(np.float32), jnp.bfloat16)
    # spatially-local plausible indices: around m*N/M +- 512
    base = (np.arange(M) * (N // M))[None, :, None]
    nn = base + rng.randint(-512, 512, (B, M, K))
    nn = np.clip(nn, 0, N - 1).astype(np.int32)
    nn = jnp.asarray(nn)
    count = float(B * M * K)

    # ---------------- current formulation ----------------
    def token_loss_cur(g, h):
        gg = gather_rows_padded(g, nn)
        x = jnp.where((nn < 0)[..., None], 0.0, gg - h[:, :, None, :])
        total = jnp.sum(x, axis=(0, 1, 2), dtype=jnp.float32)
        total_sq = jnp.sum(x * x, axis=(0, 1, 2), dtype=jnp.float32)
        mean = total / count
        var = jnp.maximum(total_sq / count - mean * mean, 0.0)
        es = jax.lax.rsqrt(var + 1e-5)
        y = jax.nn.relu(x * es.astype(x.dtype) - (mean * es).astype(x.dtype))
        return jnp.sum(jnp.max(y, axis=2).astype(jnp.float32) ** 2)

    timeit("current: gather+bn+max fwd+bwd",
           jax.jit(jax.grad(token_loss_cur, argnums=(0, 1))), g, h)

    # ---------------- monotonicity formulation ----------------
    def token_loss_mono(g, h):
        gg = gather_rows_padded(g, nn)  # (B,M,K,D) - hope: fused, never stored
        vmax = jnp.max(gg, axis=2)      # (B,M,D)
        vsum = jnp.sum(gg, axis=2, dtype=jnp.float32)
        vsq = jnp.sum(
            (gg * gg).astype(jnp.float32), axis=2)
        # all-valid here (nn >= 0): x = gg - h
        total = (jnp.sum(vsum, axis=(0, 1))
                 - K * jnp.sum(h, axis=(0, 1), dtype=jnp.float32))
        hf = h.astype(jnp.float32)
        total_sq = (jnp.sum(vsq, axis=(0, 1))
                    - 2.0 * jnp.sum(hf * vsum, axis=(0, 1))
                    + K * jnp.sum(hf * hf, axis=(0, 1)))
        mean = total / count
        var = jnp.maximum(total_sq / count - mean * mean, 0.0)
        es = jax.lax.rsqrt(var + 1e-5)
        xmax = vmax - h
        y = jax.nn.relu(
            xmax * es.astype(xmax.dtype) - (mean * es).astype(xmax.dtype))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    timeit("mono: gather-reduce fwd+bwd",
           jax.jit(jax.grad(token_loss_mono, argnums=(0, 1))), g, h)

    # fwd-only comparison
    timeit("current fwd only", jax.jit(token_loss_cur), g, h)
    timeit("mono fwd only", jax.jit(token_loss_mono), g, h)

    # numerical agreement
    a = jax.jit(token_loss_cur)(g, h)
    b = jax.jit(token_loss_mono)(g, h)
    print(f"loss cur={float(a):.3f} mono={float(b):.3f}", flush=True)

    # isolate: scatter-add cost (bwd of gather alone)
    def gsum(g):
        return jnp.sum(gather_rows_padded(g, nn).astype(jnp.float32) ** 2)

    timeit("gather-only fwd+bwd (scatter cost)", jax.jit(jax.grad(gsum)), g)

    # isolate: segment-sum style scatter via sort (alternative)
    dvals = jnp.asarray(rng.randn(B, M, D).astype(np.float32), jnp.bfloat16)

    def scatter_bmd(dv):
        # scatter (B,M,D) values at nn[..., 0] into (B,N,D) — 16x smaller
        # update volume than the full (B,M,K,D) scatter
        z = jnp.zeros((B, N, D), jnp.float32)
        return jnp.sum(z.at[
            jnp.arange(B)[:, None], nn[:, :, 0]].add(dv.astype(jnp.float32)))

    timeit("scatter (B,M,D)->(B,N,D) only", jax.jit(scatter_bmd), dvals)


if __name__ == "__main__":
    main()

"""Microbench: backward-pass building blocks for the fused token builder.

Decides the GroupedBNReluMax custom-VJP design: the analytic backward needs
dg = scatter-add of per-neighbor row contributions into the (B, N, D) source
grid. This measures whether XLA's row scatter-add is fast enough at flagship
shapes (B=32, N=10240, M=2048, K=16, D=512) or whether the backward must be
a Pallas kernel.

    python scripts/microbench_scatter.py
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
    dy = jnp.asarray(rng.randn(B, M, D).astype(np.float32), jnp.bfloat16)
    nn_idx = jnp.asarray(rng.randint(0, N, size=(B, M, K)), jnp.int32)
    bcol = jnp.arange(B, dtype=jnp.int32)[:, None]

    # 1. one row scatter-add: (B, M, D) rows -> (B, N, D)
    @jax.jit
    def one_scatter(upd, idx1):
        dst = jnp.zeros((B, N, D), jnp.float32)
        return dst.at[bcol, idx1, :].add(upd.astype(jnp.float32))

    timeit("1 row scatter-add (B,M,D)->(B,N,D)", one_scatter, dy, nn_idx[:, :, 0])

    # 2. one gather of rows (for calibration)
    @jax.jit
    def one_gather(src, idx1):
        return jnp.take_along_axis(src, idx1[..., None], axis=1)

    timeit("1 row gather (B,M,D)<-(B,N,D)", one_gather, g, nn_idx[:, :, 0])

    # 3. flattened single scatter of all M*K rows
    @jax.jit
    def flat_scatter(upd, idx):
        dst = jnp.zeros((B, N, D), jnp.float32)
        upd_k = jnp.broadcast_to(upd[:, :, None, :], (B, M, K, D)).reshape(B, M * K, D)
        return dst.at[bcol, idx.reshape(B, M * K), :].add(upd_k.astype(jnp.float32))

    timeit("flat scatter-add (B,M*K,D)->(B,N,D)", flat_scatter, dy, nn_idx)

    # 4. the full analytic-backward shape: 16x (gather + elementwise + scatter)
    @jax.jit
    def bwd_like(g, h, dy, idx):
        dg = jnp.zeros((B, N, D), jnp.float32)
        found = jnp.zeros((B, M, D), jnp.bool_)
        sel = dy  # stand-in for the saved extremum
        for k in range(K):
            ik = idx[:, :, k]
            xk = jnp.take_along_axis(g, ik[..., None], axis=1) - h
            hit = (xk == sel) & ~found
            found = found | hit
            contrib = jnp.where(hit, dy, 0) + 1e-4 * xk
            dg = dg.at[bcol, ik, :].add(contrib.astype(jnp.float32))
        return dg

    timeit("16x gather+scatter analytic-bwd shape", bwd_like, g, h, dy, nn_idx)

    # 5. scalar scatter for counts
    @jax.jit
    def count_scatter(idx):
        cnt = jnp.zeros((B, N), jnp.float32)
        return cnt.at[bcol, idx.reshape(B, M * K)].add(1.0)

    timeit("count scatter (B,M*K)->(B,N)", count_scatter, nn_idx)

    # 6. fwd-only GroupedBNReluMax (train stats), for the fwd/bwd split
    from pointcloudmatters_tpu.models.components.nn_utils import GroupedBNReluMax

    mod = GroupedBNReluMax()
    variables = mod.init(jax.random.PRNGKey(0), g, h, nn_idx,
                         use_running_average=False)

    @jax.jit
    def fwd_only(g, h):
        y, _ = mod.apply(variables, g, h, nn_idx, use_running_average=False,
                         mutable=["batch_stats"])
        return y

    timeit("GroupedBNReluMax fwd only", fwd_only, g, h)


if __name__ == "__main__":
    main()

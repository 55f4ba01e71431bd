"""Validate + microbench the fused token builder at the flagship shape.

Compares: (a) pallas core vs XLA core forward values, (b) custom_vjp dW vs
direct autodiff of the unfused expression, (c) fwd and fwd+bwd wall time of
the fused path vs the unfused XLA chain.
Run: python -u scripts/bench_fused_builder.py [small]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if "cpu" in sys.argv[1:]:  # the sandbox pins JAX_PLATFORMS to the TPU tunnel
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pointcloudmatters_tpu.ops.fused_builder import (
    grouped_stats_data, _builder_fwd_impl,
)

SMALL = "small" in sys.argv[1:]
B, N, M, K, D, Cin = (4, 1280, 256, 16, 256, 9) if SMALL else (
    32, 10240, 2048, 16, 512, 9)


def build_inputs(seed=0):
    from __graft_entry__ import build_batch
    from pointcloudmatters_tpu.ops.pointops import (
        farthest_point_sampling_padded, knn_query_padded,
    )

    batch = build_batch(batch_size=B, n_points=N)
    coord = jnp.asarray(batch["pcds"]["coord"])
    feat = jnp.asarray(batch["pcds"]["feat"])
    valid = jnp.asarray(batch["pcds"]["valid"])
    fps = farthest_point_sampling_padded(coord, valid, M)
    new_xyz = jnp.take_along_axis(coord, fps[..., None], axis=1)
    nn_idx, _ = knn_query_padded(new_xyz, coord, valid, K)
    src = jnp.concatenate([coord, feat], -1).astype(jnp.bfloat16)
    query = jnp.concatenate(
        [new_xyz, jnp.zeros(new_xyz.shape[:-1] + (feat.shape[-1],))], -1
    ).astype(jnp.bfloat16)
    rng = np.random.RandomState(seed)
    W = jnp.asarray(rng.randn(Cin, D) * 0.1, jnp.bfloat16)
    return src, query, W, nn_idx


def unfused(src, query, W, nn_idx):
    """The current GroupedBNReluMax math (XLA chain), returning the same
    4-tuple as grouped_builder_stats."""
    from pointcloudmatters_tpu.ops.pointops import gather_rows_padded

    g = src @ W
    h = query @ W
    hole = (nn_idx < 0)[..., None]
    gg = gather_rows_padded(g, nn_idx)
    x = gg - h[:, :, None, :]
    neg = jnp.asarray(-jnp.inf, x.dtype)
    pos = jnp.asarray(jnp.inf, x.dtype)
    vmax = jnp.max(jnp.where(hole, neg, x), axis=2)
    vmin = jnp.min(jnp.where(hole, pos, x), axis=2)
    xz = jnp.where(hole, jnp.zeros((), x.dtype), x)
    total = jnp.sum(xz, axis=(0, 1, 2), dtype=jnp.float32)
    total_sq = jnp.sum(xz * xz, axis=(0, 1, 2), dtype=jnp.float32)
    return vmax, vmin, total, total_sq


def scalarize(outs, cvec):
    vmax, vmin, total, total_sq = outs
    return (jnp.sum(vmax.astype(jnp.float32) * cvec)
            + jnp.sum(vmin.astype(jnp.float32) * (cvec + 0.25))
            + jnp.sum(total * 1e-3) + jnp.sum(total_sq * 1e-4))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    src, query, W, nn_idx = build_inputs()
    on_tpu = jax.devices()[0].platform == "tpu"
    impl = "pallas" if on_tpu else "xla"
    print(f"impl={impl} B={B} N={N} M={M} K={K} D={D}", flush=True)

    def fused_call(src, query, W, nn_idx, impl=impl):
        return grouped_stats_data(src, W, query @ W, nn_idx, impl=impl)

    fused_f = jax.jit(fused_call)
    ref_f = jax.jit(unfused)

    out_f = fused_f(src, query, W, nn_idx)
    out_r = ref_f(src, query, W, nn_idx)
    for name, a, b in zip(("vmax", "vmin"), out_f[:2], out_r[:2]):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        exact = np.array_equal(a32, b32)
        print(f"{name}: exact={exact} maxabs={np.abs(a32 - b32).max()}",
              flush=True)
    for name, a, b in zip(("total", "total_sq"), out_f[2:], out_r[2:]):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / max(1.0, np.abs(b).max())
        print(f"{name}: rel={rel:.3e}", flush=True)

    # gradient check: dW of fused vs autodiff of unfused
    rng = np.random.RandomState(1)
    cvec = jnp.asarray(rng.randn(B, M, D) * 0.1, jnp.float32)

    def loss_fused(W):
        return scalarize(fused_f(src, query, W, nn_idx), cvec)

    def loss_ref(W):
        return scalarize(ref_f(src, query, W, nn_idx), cvec)

    gW_f = jax.jit(jax.grad(loss_fused))(W)
    gW_r = jax.jit(jax.grad(loss_ref))(W)
    a = np.asarray(gW_f, np.float32)
    b = np.asarray(gW_r, np.float32)
    sc = max(1.0, np.abs(b).max())
    # NOTE: on TPU, XLA's autodiff of the unfused max sees UNROUNDED bf16
    # intermediates in its tie compare (see _core_xla barrier comment), so
    # this is a loose check there and a tight one on CPU.
    print(f"dW vs unfused autodiff rel err: {np.abs(a - b).max() / sc:.4f} "
          f"(|ref|max={np.abs(b).max():.3f})", flush=True)
    if impl == "pallas":
        xla_f = jax.jit(functools.partial(fused_call, impl="xla"))

        def loss_xla(W):
            return scalarize(xla_f(src, query, W, nn_idx), cvec)

        gW_x = jax.jit(jax.grad(loss_xla))(W)
        bx = np.asarray(gW_x, np.float32)
        print(f"dW pallas vs xla-impl rel err: "
              f"{np.abs(a - bx).max() / max(1.0, np.abs(bx).max()):.4f}",
              flush=True)

    # timing
    timeit("unfused fwd", ref_f, src, query, W, nn_idx)
    timeit("fused fwd", fused_f, src, query, W, nn_idx)
    gr = jax.jit(jax.grad(loss_ref))
    gf = jax.jit(jax.grad(loss_fused))
    timeit("unfused fwd+bwd(dW)", gr, W)
    timeit("fused fwd+bwd(dW)", gf, W)


if __name__ == "__main__":
    main()

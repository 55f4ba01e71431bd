"""Micro-benchmarks for round-2 optimization decisions. Not part of the bench.

Times on the real chip: FPS kernel, gather formulations, top-k variants,
and transformer fwd+bwd (bf16) with dense vs flash attention.
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
        print(f"{name:48s} {dt:8.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:48s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return float("inf")


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    coord = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 0.4 - 0.2)
    valid = jnp.ones((B, N), bool)

    # ---------------- FPS ----------------
    from pointcloudmatters_tpu.ops.pallas_fps import (
        farthest_point_sampling_padded_pallas,
    )

    fps = jax.jit(lambda c, v: farthest_point_sampling_padded_pallas(c, v, M))
    timeit("fps pallas (bb=8 grid)", fps, coord, valid)

    idx_q = fps(coord, valid)
    new_xyz = jnp.take_along_axis(coord, idx_q[..., None], axis=1)

    # ---------------- gather variants ----------------
    g32 = jnp.asarray(rng.rand(B, N, C).astype(np.float32))
    g16 = g32.astype(jnp.bfloat16)
    nn_idx = jnp.asarray(rng.randint(0, N, (B, M, K)).astype(np.int32))

    def gather_vmap(g, idx):
        Bb, Mm, Kk = idx.shape
        return jax.vmap(lambda f, i: f[i])(g, idx.reshape(Bb, Mm * Kk)).reshape(
            Bb, Mm, Kk, g.shape[-1]
        )

    def gather_flat(g, idx):
        Bb, Nn, Cc = g.shape
        flat = g.reshape(Bb * Nn, Cc)
        off = (jnp.arange(Bb, dtype=jnp.int32) * Nn)[:, None, None]
        return jnp.take(flat, (idx + off).reshape(-1), axis=0).reshape(
            Bb, *idx.shape[1:], Cc
        )

    def gather_tala(g, idx):
        Bb, Mm, Kk = idx.shape
        return jnp.take_along_axis(
            g[:, :, None, :], idx[..., None, None].repeat(1, 2), axis=1
        )

    def gather_onehotless(g, idx):
        # gather then immediately max-reduce over K (fused consumer test)
        out = gather_flat(g, idx)
        return jnp.max(out, axis=2)

    timeit("gather vmap f32 (B,M,K,512)", jax.jit(gather_vmap), g32, nn_idx)
    timeit("gather flat-take f32", jax.jit(gather_flat), g32, nn_idx)
    timeit("gather flat-take bf16", jax.jit(gather_flat), g16, nn_idx)
    timeit("gather flat-take bf16 + fused max", jax.jit(gather_onehotless),
           g16, nn_idx)

    # gather backward (scatter-add) cost
    def gather_loss(g, idx):
        out = gather_flat(g, idx)
        return jnp.sum(jnp.max(out.astype(jnp.float32), axis=2))

    timeit("gather+max bwd f32", jax.jit(jax.grad(gather_loss)), g32, nn_idx)

    # ---------------- top-k variants ----------------
    d2_big = jnp.asarray(rng.rand(B * M, N).astype(np.float32))

    timeit("lax.top_k k=16 (65536,10240)",
           jax.jit(lambda d: jax.lax.top_k(-d, K)), d2_big)
    timeit("approx_min_k k=16 recall=0.95",
           jax.jit(lambda d: jax.lax.approx_min_k(d, K, recall_target=0.95)),
           d2_big)
    timeit("approx_min_k k=16 recall=1.0",
           jax.jit(lambda d: jax.lax.approx_min_k(d, K, recall_target=1.0)),
           d2_big)
    timeit("approx_min_k k=32 recall=1.0",
           jax.jit(lambda d: jax.lax.approx_min_k(d, 32, recall_target=1.0)),
           d2_big)

    # exactness check for approx_min_k at these shapes
    d_small = jnp.asarray(rng.rand(256, N).astype(np.float32))
    ex_v, ex_i = jax.lax.top_k(-d_small, K)
    ap_v, ap_i = jax.lax.approx_min_k(d_small, K, recall_target=1.0)
    match = float(jnp.mean((jnp.sort(-ex_v, -1) == jnp.sort(ap_v, -1)).astype(jnp.float32)))
    print(f"approx_min_k(recall=1.0) vs exact value match: {match:.6f}",
          flush=True)
    ap_v95, _ = jax.lax.approx_min_k(d_small, K, recall_target=0.95)
    match95 = float(jnp.mean((jnp.sort(-ex_v, -1) == jnp.sort(ap_v95, -1)).astype(jnp.float32)))
    print(f"approx_min_k(recall=0.95) vs exact value match: {match95:.6f}",
          flush=True)

    # current pallas knn for reference
    from pointcloudmatters_tpu.ops.pallas_knn import knn_query_padded_pallas

    timeit("pallas knn (current)",
           jax.jit(lambda q, c, v: knn_query_padded_pallas(q, c, v, K)[0]),
           new_xyz, coord, valid)

    # full-matrix d2 + approx_min_k pipeline (XLA, batched)
    def knn_via_approx(q, c, v):
        a2 = jnp.sum(q * q, -1)[..., :, None]
        b2 = jnp.sum(c * c, -1)[..., None, :]
        ab = jnp.einsum("bmc,bnc->bmn", q, c,
                        preferred_element_type=jnp.float32)
        d2 = jnp.maximum(a2 + b2 - 2 * ab, 0.0)
        d2 = jnp.where(v[:, None, :], d2, 1e10)
        neg_d, idx = jax.lax.approx_min_k(d2, K, recall_target=1.0)
        return idx

    timeit("knn via full-d2 + approx_min_k(1.0)",
           jax.jit(knn_via_approx), new_xyz, coord, valid)

    # ---------------- transformer bf16 dense vs flash ----------------
    from pointcloudmatters_tpu.models.components.act.transformer import (
        Transformer,
    )

    for impl in ("dense", "flash"):
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

        def tr_loss(params, src, impl=impl, tr=tr):
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


if __name__ == "__main__":
    main()

"""Dissect the flagship encoder layer cost on the real chip.

    python -u scripts/dissect_transformer.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

B, L, D, H = 32, 2051, 512, 8


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


def cast(tree, dtype=jnp.bfloat16):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32), jnp.bfloat16)
    pos = jnp.asarray(rng.randn(1, L, D).astype(np.float32), jnp.bfloat16)

    # 1. oneshot attention core alone, fwd+bwd
    from pointcloudmatters_tpu.ops.oneshot_attention import oneshot_attention

    qh = jnp.asarray(rng.randn(B, H, L, D // H).astype(np.float32), jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)

    def att_loss(q, k, v):
        o = oneshot_attention(q, k, v, seed, 1.0 / np.sqrt(D // H), 0.1)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    timeit("oneshot core fwd+bwd (1 layer, drop=0.1)",
           jax.jit(jax.grad(att_loss, argnums=(0, 1, 2))), qh, qh, qh)

    def att_loss0(q, k, v):
        o = oneshot_attention(q, k, v, seed, 1.0 / np.sqrt(D // H), 0.0)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    timeit("oneshot core fwd+bwd (1 layer, drop=0)",
           jax.jit(jax.grad(att_loss0, argnums=(0, 1, 2))), qh, qh, qh)

    # 2. single encoder layer fwd+bwd (train mode dropout)
    from pointcloudmatters_tpu.models.components.act.transformer import (
        TransformerEncoderLayer,
    )

    layer = TransformerEncoderLayer(D, H, 32, 0.1, "relu", False,
                                    attention_impl="oneshot")
    lvars = layer.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x, pos,
                       deterministic=True)
    lparams = cast(lvars["params"])

    def layer_loss(params, x):
        y = layer.apply({"params": params}, x, pos, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(y.astype(jnp.float32) ** 2)

    timeit("1 encoder layer fwd+bwd (train)",
           jax.jit(jax.grad(layer_loss, argnums=(0, 1))), lparams, x)

    def layer_loss_det(params, x):
        y = layer.apply({"params": params}, x, pos, deterministic=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    timeit("1 encoder layer fwd+bwd (no dropout)",
           jax.jit(jax.grad(layer_loss_det, argnums=(0, 1))), lparams, x)

    # 3. QKVO projections alone fwd+bwd
    wq = jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.02, jnp.bfloat16)

    def qkvo_loss(w, x):
        t = 0.0
        for _ in range(4):
            t = t + jnp.sum((x @ w).astype(jnp.float32) ** 2)
        return t

    timeit("QKVO 4 matmuls fwd+bwd", jax.jit(jax.grad(qkvo_loss, argnums=(0, 1))),
           wq, x)

    # 4. LayerNorm x2 fwd+bwd
    ln = nn.LayerNorm(epsilon=1e-5)
    lnv = cast(ln.init(jax.random.PRNGKey(0), x)["params"])

    def ln_loss(p, x):
        y = ln.apply({"params": p}, x)
        y = ln.apply({"params": p}, y)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    timeit("LayerNorm x2 fwd+bwd", jax.jit(jax.grad(ln_loss, argnums=(0, 1))),
           lnv, x)

    # 5. Dropout x3 fwd+bwd
    def drop_loss(x):
        y = x
        for i in range(3):
            y = nn.Dropout(0.1, deterministic=False).apply(
                {}, y, rngs={"dropout": jax.random.PRNGKey(i)})
        return jnp.sum(y.astype(jnp.float32) ** 2)

    timeit("Dropout x3 fwd+bwd", jax.jit(jax.grad(drop_loss)), x)

    # 6. decoder (live layer) fwd+bwd
    from pointcloudmatters_tpu.models.components.act.transformer import (
        TransformerDecoder,
    )

    dec = TransformerDecoder(D, H, 32, 0.1, "relu", False, num_layers=7,
                             return_intermediate=True)
    qe = jnp.asarray(rng.randn(B, 100, D).astype(np.float32), jnp.bfloat16)
    tgt = jnp.zeros_like(qe)
    dvars = dec.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)}, tgt, x,
                     pos=pos, query_pos=qe, deterministic=True)
    dparams = cast(dvars["params"])

    def dec_loss(params, mem):
        hs = dec.apply({"params": params}, tgt, mem, pos=pos, query_pos=qe,
                       deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(hs[0].astype(jnp.float32) ** 2)

    timeit("decoder hs[0] fwd+bwd", jax.jit(jax.grad(dec_loss, argnums=(0, 1))),
           dparams, x)


if __name__ == "__main__":
    main()

"""Layer-attention fwd+bwd microbench: fused_mha true backward (round 5)
vs the composed path (einsum projections + oneshot core) at the flagship
encoder shape. Decides whether attention_impl='fused' becomes the training
default. Run: python -u scripts/bench_fused_bwd.py
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

B, L, D, H = 32, 2051, 512, 8
DH = D // H


def timeit(name, fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from pointcloudmatters_tpu.ops.fused_mha import fused_mha
    from pointcloudmatters_tpu.ops.oneshot_attention import oneshot_attention

    rng = np.random.RandomState(0)
    x_qk = jnp.asarray(rng.randn(B, L, D) * 0.5, jnp.bfloat16)
    x_v = jnp.asarray(rng.randn(B, L, D) * 0.5, jnp.bfloat16)
    mk = lambda: jnp.asarray(rng.randn(D, D) * 0.03, jnp.bfloat16)
    vb = lambda: jnp.asarray(rng.randn(D) * 0.03, jnp.bfloat16)
    ws = [mk(), vb(), mk(), vb(), mk(), vb(), mk(), vb()]
    seed = jnp.asarray([7], jnp.int32)

    def composed(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, rate):
        q = (jnp.einsum("bld,de->ble", x_qk, wq) + bq)
        k = (jnp.einsum("bld,de->ble", x_qk, wk) + bk)
        v = (jnp.einsum("bld,de->ble", x_v, wv) + bv)
        to_bhld = lambda t: t.reshape(B, L, H, DH).transpose(0, 2, 1, 3)
        o = oneshot_attention(to_bhld(q), to_bhld(k), to_bhld(v), seed,
                              DH ** -0.5, rate)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, D)
        return jnp.einsum("bld,de->ble", o, wo) + bo

    def fused(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, rate):
        return fused_mha(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, seed,
                         H, rate)

    for rate in (0.0, 0.1):
        for name, f in (("composed", composed), ("fused", fused)):
            fwd = jax.jit(functools.partial(f, rate=rate))
            timeit(f"{name} rate={rate} fwd", fwd, x_qk, x_v, *ws)

            def loss(*a, f=f):
                return jnp.sum(f(*a, rate=rate).astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss, argnums=tuple(range(10))))
            timeit(f"{name} rate={rate} fwd+bwd", g, x_qk, x_v, *ws)

    # grad agreement sanity at rate 0 (same math, different schedule)
    def lc(*a):
        return jnp.sum(composed(*a, rate=0.0).astype(jnp.float32) ** 2)

    def lf(*a):
        return jnp.sum(fused(*a, rate=0.0).astype(jnp.float32) ** 2)

    g1 = jax.jit(jax.grad(lc, argnums=(0, 2, 8)))(x_qk, x_v, *ws)
    g2 = jax.jit(jax.grad(lf, argnums=(0, 2, 8)))(x_qk, x_v, *ws)
    for (a, b, tag) in zip(g1, g2, ("dx_qk", "dwq", "dwo")):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        sc = max(1.0, np.abs(a).max())
        print(f"{tag} rel err {np.abs(a - b).max() / sc:.5f}")


if __name__ == "__main__":
    main()

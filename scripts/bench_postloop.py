"""Where do the ~70 us/block go? Ablate the fused-builder post-loop passes.
Run: python -u scripts/bench_postloop.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Dp, K = 256, 16
D = 2 * Dp
R = 8  # repeat post-loop work R times per call to amortize call overhead


def timeit(name, kernel, n_in=1, iters=100, **kw):
    rng = np.random.RandomState(0)
    G = jnp.asarray(rng.randn(K, Dp, 128), jnp.float32)
    h = jnp.asarray(rng.randn(D, 128) * 0.2, jnp.bfloat16)
    f = jax.jit(lambda G, h: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((D, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        **kw,
    )(G, h))
    out = f(G, h)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(G, h)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters / R
    print(f"{name:38s} {dt*1e6:8.2f} us/blockpass", flush=True)


def k_bitcast_only(G_ref, h_ref, o_ref):
    acc = jnp.zeros((D, 128), jnp.float32)
    for _ in range(R):
        for k in range(K):
            gk = pltpu.bitcast(G_ref[k], jnp.bfloat16)
            acc = acc + gk.astype(jnp.float32)
    o_ref[...] = acc


def k_pass1(G_ref, h_ref, o_ref):
    h = h_ref[...] if False else None
    hb = jnp.asarray(0, jnp.bfloat16)
    acc = jnp.zeros((D, 128), jnp.float32)
    for _ in range(R):
        h2 = G_ref[0]  # dummy
        neg = jnp.asarray(-jnp.inf, jnp.bfloat16)
        pos = jnp.asarray(jnp.inf, jnp.bfloat16)
        vmax = jnp.full((D, 128), neg)
        vmin = jnp.full((D, 128), pos)
        sg = jnp.zeros((D, 128), jnp.float32)
        tot = jnp.zeros((D, 128), jnp.float32)
        tot2 = jnp.zeros((D, 128), jnp.float32)
        hh = pltpu.bitcast(G_ref[1], jnp.bfloat16)
        for k in range(K):
            gk = pltpu.bitcast(G_ref[k], jnp.bfloat16)
            xk = gk - hh
            vmax = jnp.maximum(vmax, xk)
            vmin = jnp.minimum(vmin, xk)
            sg = sg + gk.astype(jnp.float32)
            xz = xk.astype(jnp.float32)
            tot = tot + xz
            tot2 = tot2 + xz * xz
        acc = acc + tot + tot2 + sg + vmax.astype(jnp.float32)
    o_ref[...] = acc


def k_pass2(G_ref, h_ref, o_ref):
    acc = jnp.zeros((D, 128), jnp.float32)
    for _ in range(R):
        hh = pltpu.bitcast(G_ref[1], jnp.bfloat16)
        vmax32 = pltpu.bitcast(G_ref[2], jnp.bfloat16).astype(jnp.float32)
        vmin32 = pltpu.bitcast(G_ref[3], jnp.bfloat16).astype(jnp.float32)
        bm = jnp.zeros((D, 128), jnp.int32)
        for k in range(K):
            gk = pltpu.bitcast(G_ref[k], jnp.bfloat16)
            xk32 = (gk - hh).astype(jnp.float32)
            bit_max = jnp.int32(1) << jnp.int32(k)
            bit_min = jnp.int32(1) << jnp.int32((k + 16) % 31)
            bm = bm + jnp.where(xk32 == vmax32, bit_max, 0)
            bm = bm + jnp.where(xk32 == vmin32, bit_min, 0)
        acc = acc + bm.astype(jnp.float32)
    o_ref[...] = acc


def k_f32_pass1(G_ref, h_ref, o_ref):
    """Same as pass1 but reading G as raw f32 (no bitcast) — isolates the
    bitcast cost from the arithmetic cost."""
    acc = jnp.zeros((D, 128), jnp.float32)
    for _ in range(R):
        vmax = jnp.full((Dp, 128), -jnp.inf, jnp.float32)
        tot = jnp.zeros((Dp, 128), jnp.float32)
        tot2 = jnp.zeros((Dp, 128), jnp.float32)
        for k in range(K):
            gk = G_ref[k]
            vmax = jnp.maximum(vmax, gk)
            tot = tot + gk
            tot2 = tot2 + gk * gk
        acc = acc.at[:Dp].add(tot + tot2 + vmax)
    o_ref[...] = acc


timeit("bitcast+upcast+add x16", k_bitcast_only)
timeit("full pass1 (max/min/sg/stats)", k_pass1)
timeit("full pass2 (tie bitmap)", k_pass2)
timeit("f32 pass1 (no bitcast)", k_f32_pass1)

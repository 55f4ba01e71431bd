"""Cost model of the fused-builder visit body, on-chip.

Replicates the real while-loop body (window load at dynamic chunk, K tiles of
taa + masked store, chunk-state update + min reduce) with a KNOWN trip count,
varying K to separate fixed per-visit cost from per-tile marginal cost.
Run: python -u scripts/bench_visit_body.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Dp, C = 256, 80
VISITS = 24
_BIG = 2**30


def make(K):
    def kernel(idx_ref, gp_ref, o_ref, G_ref):
        idx = idx_ref[...]  # (K, 128) — values = chunk*128 + lane offsets
        G_ref[...] = jnp.zeros_like(G_ref)

        def cond(carry):
            return carry[0] < _BIG

        def body(carry):
            c, st = carry
            win = gp_ref[0, c]
            base = c * 128
            for k in range(K):
                row = idx[k:k + 1]
                rel = jnp.clip(row - base, 0, 127)
                inw = (row >> 7) == c
                got = jnp.take_along_axis(
                    win, jnp.broadcast_to(rel, (Dp, 128)), axis=1
                )
                pltpu.store(G_ref.at[k], got,
                            mask=jnp.broadcast_to(inw, (Dp, 128)))
            st = jnp.where(st == c, _BIG, st)
            return (jnp.min(st), st)

        st0 = idx >> 7
        lax.while_loop(cond, body, (jnp.min(st0), st0))
        o_ref[...] = pltpu.bitcast(G_ref[0], jnp.bfloat16)

    rng = np.random.RandomState(0)
    gp = jnp.asarray(rng.randn(1, C, Dp, 128), jnp.float32)
    # spread each row's indices over exactly VISITS chunks
    idx = (rng.randint(0, VISITS, (K, 128)) * 128
           + rng.randint(0, 128, (K, 128))).astype(np.int32)
    f = jax.jit(lambda i, g: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * Dp, 128), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((K, Dp, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(i, g))
    return f, jnp.asarray(idx), gp


def timeit(K, iters=200):
    f, idx, gp = make(K)
    out = f(idx, gp)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(idx, gp)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    per_visit = dt / VISITS * 1e9
    print(f"K={K:3d}: {dt*1e6:8.1f} us/call  {per_visit:8.1f} ns/visit  "
          f"{per_visit*0.94:7.0f} cyc/visit  "
          f"({per_visit*0.94/K:6.0f} cyc/tile-visit)", flush=True)


for K in (1, 2, 4, 8, 16):
    timeit(K)

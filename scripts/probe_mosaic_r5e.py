"""Probe: dynamic LANE-dim slicing of a big VMEM-resident row block.

If win = g_ref[0, :, pl.ds(c*128, 128)] works (and is cheap), the fused
builder can consume the projection's natural (B, D, N) output directly —
no packing, no transposes, no in-kernel bitcast.
Run: python -u scripts/probe_mosaic_r5e.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, N, C = 512, 1280, 10
R = 100


def check_correct():
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.randn(1, D, N), jnp.float32)
    sel = jnp.asarray(np.full((1, 128), 3, np.int32))

    def k(s_ref, g_ref, o_ref):
        c = jnp.min(s_ref[...])
        win = g_ref[0, :, pl.ds(c * 128, 128)]
        o_ref[...] = win

    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((D, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sel, gt)
    exp = gt[0][:, 3 * 128:4 * 128]
    print("dyn lane-slice correct:", bool(jnp.array_equal(out, exp)),
          flush=True)


def bench_slice_taa():
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.randn(1, D, N), jnp.float32)
    idx = jnp.asarray((np.arange(128) * 37) % 128, jnp.int32)[None]

    def k(i_ref, g_ref, o_ref):
        idx = i_ref[...]

        def body(i, acc):
            c = i % C
            win = g_ref[0, :, pl.ds(c * 128, 128)]
            got = jnp.take_along_axis(
                win, jnp.broadcast_to(idx, (D, 128)), axis=1
            )
            return acc + got

        o_ref[...] = lax.fori_loop(0, R, body, jnp.zeros((D, 128),
                                                         jnp.float32))

    f = jax.jit(lambda i, g: pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((D, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(i, g))
    out = f(idx, gt)
    _ = float(out.sum())
    t0 = time.perf_counter()
    iters = 50
    for _ in range(iters):
        out = f(idx, gt)
    _ = float(out.sum())
    dt = (time.perf_counter() - t0) / iters / R
    print(f"dyn lane-slice + taa (512,128): {dt*1e9:7.1f} ns/op "
          f"({dt*0.94e9:6.0f} cyc)", flush=True)


def bench_einsum_bdn():
    """Does einsum('bni,id->bdn') cost the same as the natural layout?"""
    B, Nn, Ci, Dd = 32, 10240, 9, 512
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(B, Nn, Ci) * 0.3, jnp.bfloat16)
    W = jnp.asarray(rng.randn(Ci, Dd) * 0.1, jnp.bfloat16)

    def timeit(name, f):
        out = f(src, W)
        _ = float(out.astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(src, W)
        _ = float(out.astype(jnp.float32).sum())
        print(f"{name:28s} {(time.perf_counter()-t0)/20*1e3:7.2f} ms",
              flush=True)

    timeit("einsum bni,id->bnd", jax.jit(
        lambda s, w: jnp.einsum("bni,id->bnd", s, w)))
    timeit("einsum bni,id->bdn", jax.jit(
        lambda s, w: jnp.einsum("bni,id->bdn", s, w)))
    timeit("bnd then transpose", jax.jit(
        lambda s, w: jnp.einsum("bni,id->bnd", s, w).transpose(0, 2, 1)))


check_correct()
bench_slice_taa()
bench_einsum_bdn()

"""Microbench the fused-builder kernel primitives on-chip.

Measures per-op cost of: 128-lane take_along_axis at (Dp,128), the window
load gp_ref[0,c], the select-merge, and the while_loop skeleton — to find
where the ~230 cycles/tile-visit go (taa alone should be ~32-64).
Run: python -u scripts/bench_taa_prims.py
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Dp, C, R = 256, 80, 200  # packed rows, chunks, inner reps


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    per_op = dt / R * 1e9
    print(f"{name:34s} {dt*1e3:8.3f} ms  ({per_op:7.1f} ns/op, "
          f"{per_op*0.94:6.0f} cyc)", flush=True)


def run(name, body_fn, n_out=1):
    """body_fn(i, gp_ref, idx, acc) -> acc; looped R times."""

    def kernel(idx_ref, gp_ref, o_ref):
        idx = idx_ref[...]  # (1, 128)

        def body(i, acc):
            return body_fn(i, gp_ref, idx, acc)

        acc = lax.fori_loop(0, R, body, jnp.zeros((Dp, 128), jnp.float32))
        o_ref[...] = acc

    gp = jnp.asarray(
        np.random.RandomState(0).randn(C, Dp, 128), jnp.float32
    )
    idx = jnp.asarray((np.arange(128) * 37) % 128, jnp.int32)[None]
    f = jax.jit(lambda idx, gp: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(idx, gp))
    timeit(name, f, idx, gp)


def main():
    # 1. pure taa from a fixed window (held in regs/VMEM)
    def b_taa(i, gp_ref, idx, acc):
        win = gp_ref[0]
        got = jnp.take_along_axis(
            win, jnp.broadcast_to(idx, (Dp, 128)), axis=1
        )
        return acc + got

    run("taa (fixed window) + add", b_taa)

    # 2. dynamic window load only
    def b_load(i, gp_ref, idx, acc):
        c = i % C
        return acc + gp_ref[c]

    run("dynamic window load + add", b_load)

    # 3. dynamic load + taa
    def b_load_taa(i, gp_ref, idx, acc):
        win = gp_ref[i % C]
        got = jnp.take_along_axis(
            win, jnp.broadcast_to(idx, (Dp, 128)), axis=1
        )
        return acc + got

    run("dyn load + taa + add", b_load_taa)

    # 4. taa + select (the real merge)
    def b_taa_sel(i, gp_ref, idx, acc):
        win = gp_ref[0]
        rel = jnp.clip(idx - i, 0, 127)
        inw = (idx >> 7) == (i % 2)
        got = jnp.take_along_axis(
            win, jnp.broadcast_to(rel, (Dp, 128)), axis=1
        )
        return jnp.where(jnp.broadcast_to(inw, (Dp, 128)), got, acc)

    run("taa + rel/inw + select", b_taa_sel)

    # 5. loop skeleton only (no vector work)
    def b_skel(i, gp_ref, idx, acc):
        return acc + jnp.float32(i)

    run("loop skeleton (scalar add)", b_skel)

    # 6. add-only vector op for scale
    def b_add(i, gp_ref, idx, acc):
        return acc + gp_ref[0]

    run("static window add", b_add)


if __name__ == "__main__":
    main()

"""Ablate the oneshot attention kernel to find its cost floor.

Times forward-only kernel variants with pieces removed (wrong math, right
shapes) to attribute the per-layer cost: MXU matmuls vs exp vs reduces vs
masking. python scripts/ablate_oneshot.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, L, D = 32, 8, 2051, 64
NEG_INF = -1e30


def timeit(name, fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
    print(f"{name:56s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


def make(variant, bq=256):
    lp = -(-L // bq) * bq
    n_qt = lp // bq
    kt_layout = variant.endswith("_kT")

    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        if kt_layout:  # k arrives (D, Lp): plain (bq,D)@(D,Lp), no transpose
            s = jax.lax.dot_general(
                q, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if variant in ("qk_only", "qk_only_kT"):
            o_ref[0, 0] = jnp.sum(s, axis=1, keepdims=True).astype(
                o_ref.dtype
            ) + jnp.zeros((bq, D), o_ref.dtype)
            return
        if variant in ("full", "no_mask", "no_max", "no_exp", "full_kT"):
            if variant != "no_mask":
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < L, s, NEG_INF)
            if variant != "no_max":
                m = jnp.max(s, axis=1, keepdims=True)
                s = s - m
            if variant != "no_exp":
                e = jnp.exp(s)
            else:
                e = s
            denom = jnp.sum(e, axis=1, keepdims=True)
            acc = jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, 0] = (acc * pl.reciprocal(denom)).astype(o_ref.dtype)
            return
        if variant == "matmuls_only":
            e = s  # no mask/max/exp/sum
            acc = jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, 0] = acc.astype(o_ref.dtype)
            return
        raise ValueError(variant)

    def run(q, k, v):
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, lp - L), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, lp - L), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, lp - L), (0, 0)))
        if kt_layout:
            kp = jnp.swapaxes(kp, 2, 3)  # (B, H, D, Lp)
            k_spec = pl.BlockSpec((1, 1, D, lp), lambda b, h, i: (b, h, 0, 0))
        else:
            k_spec = pl.BlockSpec((1, 1, lp, D), lambda b, h, i: (b, h, 0, 0))
        out = pl.pallas_call(
            kernel,
            grid=(B, H, n_qt),
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0)),
                k_spec,
                pl.BlockSpec((1, 1, lp, D), lambda b, h, i: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, lp, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
        )(qp, kp, vp)
        return out[:, :, :L]

    return jax.jit(run)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, L, D).astype(np.float32), jnp.bfloat16)
    for bq in (256, 512):
        for variant in ("qk_only_kT", "full_kT", "full", "no_mask", "no_max",
                        "no_exp", "matmuls_only", "qk_only"):
            try:
                timeit(f"bq={bq} {variant} (fwd only)", make(variant, bq), q, q, q)
            except Exception as e:  # noqa: BLE001
                print(f"bq={bq} {variant}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()

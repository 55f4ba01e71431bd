"""Fused kNN Pallas kernel for TPU.

The XLA formulation of exact kNN materializes the (B, M, N) distance matrix
in HBM and re-reads it for every of the k extraction passes — measured
235-613 ms for (B=32, M=2048, N=10240, k=16) on v5e, pure HBM bandwidth.
This kernel keeps everything on chip:

- grid over (batch, query-tile); each program holds its query tile, the
  whole reference row (3 x N floats = 120 KB at N=10k), and the running
  k-best in VMEM
- per reference chunk: the distance tile comes off the MXU
  (|q|^2 + |p|^2 - 2 q.p^T), then k passes of (min, argmin, mask-out) run at
  VMEM bandwidth; the chunk's k-best is merged with the running k-best the
  same way
- HBM traffic = inputs + (B, M, k) outputs only

Coordinates are passed transposed (B, 3, N) so no size-3 minor dimension is
ever laid out on the 128-lane axis. Semantics match
``pointops.knn_query_padded`` (ascending d2, -1/1e10 padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1.0e10


def _extract_k(cand_d, cand_i, k):
    """k ascending minima of cand_d (TM, C) with their cand_i entries."""
    outs_d, outs_i = [], []
    C = cand_d.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, cand_d.shape, 1)
    for _ in range(k):
        a = jnp.argmin(cand_d, axis=-1)  # (TM,)
        hit = col == a[:, None]
        outs_d.append(jnp.min(cand_d, axis=-1))
        outs_i.append(jnp.sum(jnp.where(hit, cand_i, 0), axis=-1))
        cand_d = jnp.where(hit, _BIG, cand_d)
    return jnp.stack(outs_d, axis=-1), jnp.stack(outs_i, axis=-1)


def _knn_kernel(q_ref, p_ref, mask_ref, idx_ref, d2_ref, *, k, tn):
    # blocks carry a leading size-1 batch dim
    # q_ref: (1, 3, TM)   p_ref: (1, 3, N)   mask_ref: (1, 1, N) float
    q = q_ref[0]                      # (3, TM)
    TM = q.shape[1]
    N = p_ref.shape[2]
    q2 = jnp.sum(q * q, axis=0)[:, None]  # (TM, 1)

    best_d = jnp.full((TM, k), _BIG, jnp.float32)
    best_i = jnp.full((TM, k), 0, jnp.int32)

    for c in range(N // tn):
        p = p_ref[0, :, c * tn:(c + 1) * tn]       # (3, TN)
        m = mask_ref[0, 0, c * tn:(c + 1) * tn]    # (TN,)
        p2 = jnp.sum(p * p, axis=0)[None, :]        # (1, TN)
        cross = jax.lax.dot_general(
            q, p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # see pallas_knn3 note
        )                                            # (TM, TN)
        d2 = jnp.maximum(q2 + p2 - 2.0 * cross, 0.0)
        d2 = jnp.where(m[None, :] > 0, d2, _BIG)
        loc_i = (jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + c * tn)
        cand_d = jnp.concatenate([best_d, d2], axis=1)
        cand_i = jnp.concatenate([best_i, loc_i], axis=1)
        best_d, best_i = _extract_k(cand_d, cand_i, k)

    idx_ref[0] = jnp.where(best_d >= _BIG, -1, best_i)
    d2_ref[0] = best_d


@functools.partial(jax.jit, static_argnames=("nsample", "tm", "tn"))
def knn_query_padded_pallas(
    new_xyz: jax.Array,
    xyz: jax.Array,
    mask: jax.Array,
    nsample: int,
    tm: int = 128,
    tn: int = 2048,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in fused replacement for ``pointops.knn_query_padded`` on TPU."""
    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    M_pad = -(-M // tm) * tm
    tn = min(tn, max(N, 128))
    N_pad = -(-N // tn) * tn
    # geometry runs in f32 regardless of the surrounding compute dtype:
    # bf16 (3, TM) tiles violate Mosaic's (16, 128) sublane constraints, and
    # neighbor selection wants f32 distances anyway
    q = jnp.swapaxes(new_xyz.astype(jnp.float32), 1, 2)  # (B, 3, M)
    p = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)      # (B, 3, N)
    if M_pad != M:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, M_pad - M)))
    if N_pad != N:
        p = jnp.pad(p, ((0, 0), (0, 0), (0, N_pad - N)))
        mask = jnp.pad(mask, ((0, 0), (0, N_pad - N)))
    maskf = mask.astype(jnp.float32)[:, None, :]         # (B, 1, N)

    grid = (B, M_pad // tm)
    idx, d2 = pl.pallas_call(
        functools.partial(_knn_kernel, k=nsample, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tm), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, nsample), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, nsample), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M_pad, nsample), jnp.int32),
            jax.ShapeDtypeStruct((B, M_pad, nsample), jnp.float32),
        ],
    )(q, p, maskf)
    return idx[:, :M], d2[:, :M]

"""Chunk-skipping kNN Pallas kernel for spatially sorted clouds.

The baseline kernel (`pallas_knn.py`) spends ~90% of its time in the k-pass
min-extraction over every (query-tile, reference-chunk) pair — 47 ms at the
flagship shape (B=32, M=2048, N=10240, k=16) on v5e. This kernel adds an
exact early-out: it tracks the running k-th-best distance per query row, and
a reference chunk whose masked distance tile cannot improve ANY row of the
tile (``min(d2) >= max_rows(kth_best)``) skips the extraction entirely (the
distance matmul + two reductions still run — they're MXU/VPU-cheap).

Two things make the early-out actually fire:

1. **Spatially sorted inputs.** Callers Morton-order the cloud and the query
   set (`pointops.spatial_sort_order`); ACTPCD does this on-device
   (coordinates carry no gradient, so the sort costs two small gathers).
2. **Ring-ordered chunk visitation.** When query tile ``i`` and reference
   chunk ``c ≈ i·n_chunks/n_tiles`` cover the same stretch of the Morton
   curve, visiting chunks in the order ``c, c±1, c±2, …`` fills the running
   k-best within the first few chunks, so the k-th-best threshold is tight
   before the distant chunks arrive and they all skip. (Linear visitation
   leaves rows at +inf until their home chunk — no chunk before it can be
   skipped.) The reference tensor is pre-chunked ``(B, n_chunks, 3, tn)`` so
   the traced ring index is a cheap leading-dim dynamic load.

The skip is always correct on any input order; sorting only changes speed.
Semantics match ``pointops.knn_query_padded`` (ascending d2, -1/1e10 padding
for missing neighbors) except that **exact-distance ties are broken in an
unspecified order**: ring-ordered chunk visitation + the ``chunk_min >= tau``
early-out mean duplicated points (equal d2) can resolve to different indices
than the XLA path. The reference CUDA kernel's max-heap tie order
(`knn_query_cuda_kernel.cu:60-104`) is equally unspecified, so no caller may
rely on tie order on any backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1.0e10
_IBIG = 2**31 - 1


def _merge_chunk(best_d, best_i, d2, base, k):
    """Merge a (TM, TN) distance tile into the running ascending k-best."""
    loc_col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + base
    cand_d = jnp.concatenate([best_d, d2], axis=1)          # (TM, k+TN)
    cand_i = jnp.concatenate([best_i, loc_col], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, cand_d.shape, 1)
    outs_d, outs_i = [], []
    for _ in range(k):
        m = jnp.min(cand_d, axis=1, keepdims=True)           # (TM, 1)
        sel = jnp.min(jnp.where(cand_d <= m, col, _IBIG), axis=1, keepdims=True)
        hit = col == sel
        outs_d.append(m[:, 0])
        outs_i.append(jnp.sum(jnp.where(hit, cand_i, 0), axis=1))
        cand_d = jnp.where(hit, _BIG, cand_d)
    return jnp.stack(outs_d, axis=-1), jnp.stack(outs_i, axis=-1)


def _knn2_kernel(q_ref, p_ref, mask_ref, idx_ref, d2_ref, bd_acc, bi_acc,
                 *, k, tn, n_chunks, n_tiles):
    q = q_ref[0]                        # (3, TM) f32
    TM = q.shape[1]
    q2 = jnp.sum(q * q, axis=0)[:, None]
    qt = pl.program_id(1)
    c0 = (qt * n_chunks) // n_tiles     # the tile's home chunk

    bd_acc[...] = jnp.full((TM, k), _BIG, jnp.float32)
    bi_acc[...] = jnp.full((TM, k), -1, jnp.int32)

    # statically unrolled ring order: c0, c0+1, c0-1, c0+2, c0-2, ...
    # (c0 is program-dependent, the offsets are static — the body is
    # straight-line code with @pl.when predication, no loop-carry overhead)
    for j in range(n_chunks):
        off = (j + 1) // 2
        delta = off if j % 2 == 1 else -off
        c = jax.lax.rem(c0 + delta + n_chunks, n_chunks)
        p = p_ref[0, c]                 # (3, TN)
        m = mask_ref[0, c, 0]           # (TN,)
        p2 = jnp.sum(p * p, axis=0)[None, :]
        cross = jax.lax.dot_general(
            q, p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # see pallas_knn3 note
        )
        d2 = jnp.maximum(q2 + p2 - 2.0 * cross, 0.0)
        d2 = jnp.where(m[None, :] > 0, d2, _BIG)
        # exact early-out: this chunk can't improve any row of the tile
        tau = jnp.max(bd_acc[:, k - 1])            # scalar: worst kth-best
        chunk_min = jnp.min(d2)

        @pl.when(chunk_min < tau)
        def _(c=c, d2=d2):
            bd, bi = _merge_chunk(bd_acc[...], bi_acc[...], d2, c * tn, k)
            bd_acc[...] = bd
            bi_acc[...] = bi

    bd = bd_acc[...]
    bi = bi_acc[...]
    idx_ref[0] = jnp.where(bd >= _BIG, -1, bi)
    d2_ref[0] = bd


@functools.partial(jax.jit, static_argnames=("nsample", "tm", "tn"))
def knn_query_padded_pallas2(
    new_xyz: jax.Array,
    xyz: jax.Array,
    mask: jax.Array,
    nsample: int,
    tm: int = 128,
    tn: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ``knn_query_padded`` with chunk skipping."""
    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    M_pad = -(-M // tm) * tm
    tn = min(tn, max(N, 128))
    N_pad = -(-N // tn) * tn
    n_chunks = N_pad // tn
    n_tiles = M_pad // tm
    q = jnp.swapaxes(new_xyz.astype(jnp.float32), 1, 2)
    p = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)
    if M_pad != M:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, M_pad - M)))
    if N_pad != N:
        p = jnp.pad(p, ((0, 0), (0, 0), (0, N_pad - N)))
        mask = jnp.pad(mask, ((0, 0), (0, N_pad - N)))
    # pre-chunk so the kernel's ring index is a leading-dim dynamic load
    p = p.reshape(B, 3, n_chunks, tn).transpose(0, 2, 1, 3)  # (B, C, 3, tn)
    maskf = mask.astype(jnp.float32).reshape(B, n_chunks, 1, tn)

    grid = (B, n_tiles)
    idx, d2 = pl.pallas_call(
        functools.partial(_knn2_kernel, k=nsample, tn=tn,
                          n_chunks=n_chunks, n_tiles=n_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tm), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, n_chunks, 3, tn), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, n_chunks, 1, tn), lambda b, i: (b, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, nsample), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tm, nsample), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M_pad, nsample), jnp.int32),
            jax.ShapeDtypeStruct((B, M_pad, nsample), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tm, nsample), jnp.float32),
            pltpu.VMEM((tm, nsample), jnp.int32),
        ],
    )(q, p, maskf)
    return idx[:, :M], d2[:, :M]

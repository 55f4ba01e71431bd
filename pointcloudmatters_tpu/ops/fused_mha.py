"""Fused QKV-projection + multi-head attention + out-projection (forward).

The ACT encoder layer at the flagship shape (B=32, L=2051, d=512, 8 heads of
64) spends ~30% of its *forward* not in math but in HBM round trips between
XLA ops: the q/k/v projection outputs, their (B, H, L, 64) relayouts for the
attention kernel, the core output, and the head-concat for the out
projection. This kernel runs the whole layer-attention forward in ONE Pallas
program — measured 8.1 ms vs 11.5 ms for the composed path (XLA projections
+ the oneshot core + XLA out-projection), bit-identical outputs.

Grid is (B, n_q_tiles). Each batch item's K/V rows are projected once (at
the first q-tile) into VMEM scratch and reused by every q-tile; the per-head
loop computes the same exact whole-row softmax as `ops/oneshot_attention.py`
(max-shift, deferred normalization, in-kernel broadcast dropout regenerated
from a scalar-prefetched seed — identical mask function, so the two backends
produce the same sampled masks for a given seed).

The BACKWARD (round 5) is a second single Pallas program over the same
(B, q-tile) grid: it recomputes the forward tile flash-style (projections
included — the forward saves NOTHING but its inputs), runs the oneshot
backward math per head, and accumulates ALL eight weight/bias gradients in
VMEM scratch across the entire grid sweep, flushing them once at the final
step. dK/dV row accumulators also live in VMEM per batch item and are
turned into input gradients in-kernel (dk @ Wk^T) so no (B, L, D)
intermediate gradient ever round-trips HBM. The round-4 composed backward
(q-recompute + oneshot core + XLA weight-grad einsums) measured 40.0
ms/layer fwd+bwd against the composed path's 36.1; this formulation removes
the six BHLD relayout passes and the dq/dk/dv HBM round trips that made it
lose.

Parameter layout matches ``flax.linen.MultiHeadDotProductAttention``'s
query/key/value DenseGeneral kernels ``(D, H, dh)`` / biases ``(H, dh)`` and
out kernel ``(H, dh, D)`` / bias ``(D,)`` — the caller reshapes to the 2-D
matrices this op takes, so checkpoints are interchangeable with the other
attention backends.

Reference counterpart: torch ``nn.MultiheadAttention`` +
`act/transformer.py:62-115`; pure execution-schedule reformulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointcloudmatters_tpu.ops.oneshot_attention import (
    NEG_INF,
    _keep_mask,
)

__all__ = ["fused_mha"]


def _fwd_kernel(seed_ref, xq_ref, xk_ref, xv_ref, wq_ref, bq_ref, wk_ref,
                bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                o_ref, k_scr, v_scr, *,
                nhead, l_actual, rate, scale):
    qt = pl.program_id(1)
    D = wq_ref.shape[0]
    DH = D // nhead

    @pl.when(qt == 0)
    def _project_kv():
        xk = xk_ref[0]                      # (LKP, D) bf16, pad rows zero
        k_scr[...] = (jax.lax.dot_general(
            xk, wk_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bk_ref[...]).astype(jnp.bfloat16)
        xv = xv_ref[0]                      # (LKP, D) — the UN-positioned row
        v_scr[...] = (jax.lax.dot_general(
            xv, wv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bv_ref[...]).astype(jnp.bfloat16)


    xq = xq_ref[0]                          # (BQ, D)
    q = ((jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[...]) * scale).astype(jnp.bfloat16)

    col = None
    outs = []
    for h in range(nhead):
        qh = q[:, h * DH:(h + 1) * DH]
        kh = k_scr[:, h * DH:(h + 1) * DH]
        vh = v_scr[:, h * DH:(h + 1) * DH]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                   # (BQ, LKP) f32
        if col is None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < l_actual, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        if rate > 0.0:
            keep = _keep_mask(seed_ref[0], h, qt, e.shape, rate)
            e = jnp.where(keep, e * (1.0 / (1.0 - rate)), 0.0)
        acc = jax.lax.dot_general(
            e.astype(jnp.bfloat16), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(
            (acc * pl.reciprocal(denom, approx=False)).astype(jnp.bfloat16)
        )
    heads = jnp.concatenate(outs, axis=1)   # (BQ, D)
    o_ref[0] = (jax.lax.dot_general(
        heads, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[...]).astype(o_ref.dtype)


def _tiling(L, block_q):
    bq = min(block_q, max(L, 128))
    lqp = -(-L // bq) * bq
    lkp = -(-L // 128) * 128
    return bq, lqp, lkp, lqp // bq


def _pad_rows(x, lp):
    pad = lp - x.shape[1]
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def fused_mha(x_qk, x_v, wq, bq_, wk, bk_, wv, bv_, wo, bo_, seed,
              nhead, rate=0.0, block_q=256):
    """One-kernel self-attention layer forward.

    Args:
        x_qk: (B, L, D) bf16 positioned token row (query/key input — the ACT
            layer adds the positional embedding to q and k only).
        x_v: (B, L, D) bf16 un-positioned row (value input).
        wq/wk/wv/wo: (D, D) weight matrices; bq_/bk_/bv_: (D,), bo_: (D,).
        seed: (1,) int32 dropout seed (ignored when rate == 0).
        nhead: head count (D % nhead == 0).
        rate: attention-weight dropout rate (broadcast over batch, distinct
            per head — oneshot semantics).
        block_q: query tile edge.
    Returns (B, L, D) bf16.
    """
    out, _ = _fwd_rule(x_qk, x_v, wq, bq_, wk, bk_, wv, bv_, wo, bo_, seed,
                       nhead, rate, block_q)
    return out


def _fwd_rule(x_qk, x_v, wq, bq_, wk, bk_, wv, bv_, wo, bo_, seed,
              nhead, rate, block_q):
    B, L, D = x_qk.shape
    bq, lqp, lkp, n_qt = _tiling(L, block_q)
    scale = (D // nhead) ** -0.5
    xq = _pad_rows(x_qk, lqp)
    xk = _pad_rows(x_qk, lkp)
    xv = _pad_rows(x_v, lkp)
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    row = lambda b: b.reshape(1, D)  # biases as (1, D) rows for broadcasting
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, nhead=nhead, l_actual=L, rate=rate,
                          scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_qt),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, lkp, D), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, lkp, D), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((D, D), lambda b, i, *_: (0, 0)),
                pl.BlockSpec((1, D), lambda b, i, *_: (0, 0)),
                pl.BlockSpec((D, D), lambda b, i, *_: (0, 0)),
                pl.BlockSpec((1, D), lambda b, i, *_: (0, 0)),
                pl.BlockSpec((D, D), lambda b, i, *_: (0, 0)),
                pl.BlockSpec((1, D), lambda b, i, *_: (0, 0)),
                pl.BlockSpec((D, D), lambda b, i, *_: (0, 0)),
                pl.BlockSpec((1, D), lambda b, i, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i, *_: (b, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((lkp, D), jnp.bfloat16),
                pltpu.VMEM((lkp, D), jnp.bfloat16),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, lqp, D), x_qk.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the block working set (q/k/v rows + weights + k/v scratch)
            # exceeds the default scoped-vmem cap; v5e has headroom beyond it
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, xq, xk, xv, wq, row(bq_), wk, row(bk_), wv, row(bv_), wo,
      row(bo_))[0]
    res = (x_qk, x_v, wq, bq_, wk, bk_, wv, bv_, wo, seed)
    return out[:, :L], res


def _bwd_kernel(seed_ref, xq_ref, xk_ref, xv_ref, do_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref,
                dxq_ref, dxk_ref, dxv_ref,
                dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                dwo_ref, dbo_ref,
                k_scr, v_scr, dk_acc, dv_acc,
                dwq_acc, dbq_acc, dwk_acc, dbk_acc, dwv_acc, dbv_acc,
                dwo_acc, dbo_acc, *,
                nhead, l_actual, rate, scale, n_qt, n_b):
    """True fused backward: full flash-style recompute of the layer forward
    plus every gradient, one grid step per (batch item, q-tile).

    - weight/bias grads accumulate in VMEM scratch over the ENTIRE grid and
      flush once at the last step — no (B, L, D) intermediate gradients in
      HBM, no weight-grad einsum re-reading activations;
    - dK/dV rows accumulate per batch item and become input gradients
      in-kernel (``dk @ Wk^T``) at the item's final q-tile;
    - dX_qk is split: the dq-part streams out per q-tile (dxq), the dk-part
      lands whole-row at the item's last tile (dxk); caller adds them.
    Softmax/dropout backward math is identical to
    ``oneshot_attention._bwd_kernel`` (e/z/u formulation, same regenerated
    per-(head, q-tile) keep mask).
    """
    b = pl.program_id(0)
    qt = pl.program_id(1)
    D = wq_ref.shape[0]
    DH = D // nhead

    @pl.when(jnp.logical_and(b == 0, qt == 0))
    def _zero_weight_accs():
        dwq_acc[...] = jnp.zeros_like(dwq_acc)
        dbq_acc[...] = jnp.zeros_like(dbq_acc)
        dwk_acc[...] = jnp.zeros_like(dwk_acc)
        dbk_acc[...] = jnp.zeros_like(dbk_acc)
        dwv_acc[...] = jnp.zeros_like(dwv_acc)
        dbv_acc[...] = jnp.zeros_like(dbv_acc)
        dwo_acc[...] = jnp.zeros_like(dwo_acc)
        dbo_acc[...] = jnp.zeros_like(dbo_acc)

    @pl.when(qt == 0)
    def _project_kv():
        xk = xk_ref[0]
        k_scr[...] = (jax.lax.dot_general(
            xk, wk_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bk_ref[...]).astype(jnp.bfloat16)
        xv = xv_ref[0]
        v_scr[...] = (jax.lax.dot_general(
            xv, wv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bv_ref[...]).astype(jnp.bfloat16)

    xq = xq_ref[0]                               # (BQ, D) bf16
    q = ((jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[...]) * scale).astype(jnp.bfloat16)  # == fwd's q_pre exactly

    do = do_ref[0]                               # (BQ, D) bf16
    # dheads = dO @ Wo^T
    dheads = jax.lax.dot_general(
        do, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)

    col = None
    heads_l, dq_l, dk_l, dv_l = [], [], [], []
    for h in range(nhead):
        hs = slice(h * DH, (h + 1) * DH)
        qh = q[:, hs]
        kh = k_scr[:, hs]
        vh = v_scr[:, hs]
        doh = dheads[:, hs]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # (BQ, LKP) f32
        if col is None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < l_actual, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        r = pl.reciprocal(denom, approx=False)
        if rate > 0.0:
            keep = _keep_mask(seed_ref[0], h, qt, e.shape, rate)
            inv = 1.0 / (1.0 - rate)
            e_drop = jnp.where(keep, e * inv, 0.0)
            p_drop = jnp.where(keep, e * (inv * r), 0.0)
        else:
            keep, inv = None, 1.0
            e_drop = e
            p_drop = e * r
        # recompute this head's output for dWo (same quantization as fwd:
        # bf16 e_drop through the MXU, then the r scaling)
        acc = jax.lax.dot_general(
            e_drop.astype(jnp.bfloat16), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        heads_l.append((acc * r).astype(jnp.bfloat16))
        # dV_h = P_drop^T @ dO_h
        dv_l.append(jax.lax.dot_general(
            p_drop.astype(doh.dtype), doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        # dP_drop = dO_h @ V_h^T, then the oneshot z/u/ds chain
        dp_drop = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            z = jnp.where(keep, dp_drop * (inv * r), 0.0)
        else:
            z = dp_drop * r
        u = r * jnp.sum(z * e, axis=1, keepdims=True)
        ds = (e * (z - u)).astype(q.dtype)       # (BQ, LKP) bf16
        # dQ_pre_h = dS @ K_h ; dK_h = dS^T @ Q_pre_h
        dq_l.append(jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        dk_l.append(jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))

    heads = jnp.concatenate(heads_l, axis=1)     # (BQ, D) bf16
    dq_lin = jnp.concatenate(dq_l, axis=1) * scale  # (BQ, D) f32, d/d(xq@Wq+bq)
    dk_c = jnp.concatenate(dk_l, axis=1)         # (LKP, D) f32
    dv_c = jnp.concatenate(dv_l, axis=1)

    dq_bf = dq_lin.astype(jnp.bfloat16)
    # per-tile input grad (the dq part of dx_qk): dq_lin @ Wq^T
    dxq_ref[0] = jax.lax.dot_general(
        dq_bf, wq_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dxq_ref.dtype)

    # weight/bias accumulation (full-grid lifetime)
    dwq_acc[...] += jax.lax.dot_general(
        xq, dq_bf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbq_acc[...] += jnp.sum(dq_lin, axis=0, keepdims=True)
    dwo_acc[...] += jax.lax.dot_general(
        heads, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbo_acc[...] += jnp.sum(
        do.astype(jnp.float32), axis=0, keepdims=True
    )

    @pl.when(qt == 0)
    def _init_kv_acc():
        dk_acc[...] = dk_c
        dv_acc[...] = dv_c

    @pl.when(qt > 0)
    def _acc_kv():
        dk_acc[...] += dk_c
        dv_acc[...] += dv_c

    @pl.when(qt == n_qt - 1)
    def _flush_item():
        dk_bf = dk_acc[...].astype(jnp.bfloat16)
        dv_bf = dv_acc[...].astype(jnp.bfloat16)
        # whole-row input grads: dk @ Wk^T, dv @ Wv^T
        dxk_ref[0] = jax.lax.dot_general(
            dk_bf, wk_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dxk_ref.dtype)
        dxv_ref[0] = jax.lax.dot_general(
            dv_bf, wv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dxv_ref.dtype)
        xk = xk_ref[0]
        xv = xv_ref[0]
        dwk_acc[...] += jax.lax.dot_general(
            xk, dk_bf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbk_acc[...] += jnp.sum(dk_acc[...], axis=0, keepdims=True)
        dwv_acc[...] += jax.lax.dot_general(
            xv, dv_bf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbv_acc[...] += jnp.sum(dv_acc[...], axis=0, keepdims=True)

    @pl.when(jnp.logical_and(b == n_b - 1, qt == n_qt - 1))
    def _flush_weights():
        dwq_ref[...] = dwq_acc[...].astype(dwq_ref.dtype)
        dbq_ref[...] = dbq_acc[...].astype(dbq_ref.dtype)
        dwk_ref[...] = dwk_acc[...].astype(dwk_ref.dtype)
        dbk_ref[...] = dbk_acc[...].astype(dbk_ref.dtype)
        dwv_ref[...] = dwv_acc[...].astype(dwv_ref.dtype)
        dbv_ref[...] = dbv_acc[...].astype(dbv_ref.dtype)
        dwo_ref[...] = dwo_acc[...].astype(dwo_ref.dtype)
        dbo_ref[...] = dbo_acc[...].astype(dbo_ref.dtype)


def _bwd_rule(nhead, rate, block_q, res, dout):
    x_qk, x_v, wq, bq_, wk, bk_, wv, bv_, wo, seed = res
    B, L, D = x_qk.shape
    bq, lqp, lkp, n_qt = _tiling(L, block_q)
    scale = (D // nhead) ** -0.5
    xq = _pad_rows(x_qk, lqp)
    xk = _pad_rows(x_qk, lkp)
    xv = _pad_rows(x_v, lkp)
    dop = _pad_rows(dout.astype(x_qk.dtype), lqp)
    row = lambda t: t.reshape(1, D)
    wmat = lambda: pl.BlockSpec((D, D), lambda b, i, *_: (0, 0))
    wrow = lambda: pl.BlockSpec((1, D), lambda b, i, *_: (0, 0))
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, nhead=nhead, l_actual=L, rate=rate,
                          scale=scale, n_qt=n_qt, n_b=B),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_qt),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, lkp, D), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, lkp, D), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, bq, D), lambda b, i, *_: (b, i, 0)),
                wmat(), wrow(), wmat(), wrow(), wmat(), wrow(), wmat(),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, lkp, D), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, lkp, D), lambda b, i, *_: (b, 0, 0)),
                wmat(), wrow(), wmat(), wrow(), wmat(), wrow(),
                wmat(), wrow(),
            ],
            scratch_shapes=[
                pltpu.VMEM((lkp, D), jnp.bfloat16),   # k rows
                pltpu.VMEM((lkp, D), jnp.bfloat16),   # v rows
                pltpu.VMEM((lkp, D), f32),            # dk acc
                pltpu.VMEM((lkp, D), f32),            # dv acc
                pltpu.VMEM((D, D), f32), pltpu.VMEM((1, D), f32),  # dwq/dbq
                pltpu.VMEM((D, D), f32), pltpu.VMEM((1, D), f32),  # dwk/dbk
                pltpu.VMEM((D, D), f32), pltpu.VMEM((1, D), f32),  # dwv/dbv
                pltpu.VMEM((D, D), f32), pltpu.VMEM((1, D), f32),  # dwo/dbo
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, lqp, D), f32),   # dxq part
            jax.ShapeDtypeStruct((B, lkp, D), f32),   # dxk part
            jax.ShapeDtypeStruct((B, lkp, D), f32),   # dxv
            jax.ShapeDtypeStruct((D, D), f32), jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, D), f32), jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, D), f32), jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, D), f32), jax.ShapeDtypeStruct((1, D), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, xq, xk, xv, dop, wq, row(bq_), wk, row(bk_), wv, row(bv_), wo)
    (dxq, dxk, dxv, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo) = outs
    dx_qk = (dxq[:, :L] + dxk[:, :L]).astype(x_qk.dtype)
    dx_v = dxv[:, :L].astype(x_v.dtype)
    cast = lambda t, like: t.astype(like.dtype)
    return (dx_qk, dx_v,
            cast(dwq, wq), cast(dbq.reshape(D), bq_),
            cast(dwk, wk), cast(dbk.reshape(D), bk_),
            cast(dwv, wv), cast(dbv.reshape(D), bv_),
            cast(dwo, wo), cast(dbo.reshape(D), bq_),
            np.zeros((1,), jax.dtypes.float0))


fused_mha.defvjp(fwd=_fwd_rule, bwd=_bwd_rule)

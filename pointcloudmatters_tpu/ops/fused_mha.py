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

The BACKWARD is deliberately *composed*, not a second mega-kernel: the
forward saves (k, v, heads) as extra outputs; the backward recomputes q with
one matmul and reuses the proven oneshot backward kernel for the core, plus
plain XLA matmuls for the weight/input gradients. Measured end to end this
keeps the backward at parity with the composed path while the forward keeps
its ~3.4 ms/layer win.

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
                o_ref, h_ref, k_scr, v_scr, *,
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
    h_ref[0] = heads
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
    out, heads = pl.pallas_call(
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
                pl.BlockSpec((1, bq, D), lambda b, i, *_: (b, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((lkp, D), jnp.bfloat16),
                pltpu.VMEM((lkp, D), jnp.bfloat16),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, lqp, D), x_qk.dtype),
            jax.ShapeDtypeStruct((B, lqp, D), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the block working set (q/k/v rows + weights + k/v scratch +
            # saved outputs) exceeds the default scoped-vmem cap; v5e has
            # headroom beyond it
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, xq, xk, xv, wq, row(bq_), wk, row(bk_), wv, row(bv_), wo,
      row(bo_))
    res = (x_qk, x_v, wq, bq_, wk, bk_, wv, bv_, wo, heads, seed)
    return out[:, :L], res


def _bwd_rule(nhead, rate, block_q, res, dout):
    """Composed backward: one q-recompute matmul, the proven oneshot core
    backward kernel, and plain XLA matmuls for the weight/input grads."""
    from pointcloudmatters_tpu.ops import oneshot_attention as OA

    x_qk, x_v, wq, bq_, wk, bk_, wv, bv_, wo, heads, seed = res
    B, L, D = x_qk.shape
    DH = D // nhead
    scale = DH ** -0.5
    dout = dout.astype(x_qk.dtype)

    heads = heads[:, :L]
    # out projection grads
    dwo = jnp.einsum("bld,ble->de", heads, dout,
                     preferred_element_type=jnp.float32).astype(wo.dtype)
    dbo = jnp.sum(dout, axis=(0, 1), dtype=jnp.float32).astype(bq_.dtype)
    dheads = dout @ wo.T                          # (B, L, D)

    # core backward via the oneshot kernel (BHLD layout)
    def bhld(t, Lt):
        return t[:, :Lt].reshape(B, Lt, nhead, DH).transpose(0, 2, 1, 3)

    q = (x_qk @ wq + bq_).astype(x_qk.dtype)
    k_rows = (x_qk @ wk + bk_).astype(x_qk.dtype)
    v_rows = (x_v @ wv + bv_).astype(x_qk.dtype)
    qh = bhld(q, L)
    kh = bhld(k_rows, L)
    vh = bhld(v_rows, L)
    doh = bhld(dheads, L)
    dqh, dkh, dvh, _ = OA._bwd_rule(
        scale, rate, block_q, (qh, kh, vh, seed), doh
    )

    def bld(t):
        return t.transpose(0, 2, 1, 3).reshape(B, L, D)

    dq = bld(dqh)
    dk = bld(dkh)
    dv = bld(dvh)

    f32 = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)
    dwq = f32("bld,ble->de", x_qk, dq).astype(wq.dtype)
    dwk = f32("bld,ble->de", x_qk, dk).astype(wk.dtype)
    dwv = f32("bld,ble->de", x_v, dv).astype(wv.dtype)
    dbq = jnp.sum(dq, axis=(0, 1), dtype=jnp.float32).astype(bq_.dtype)
    dbk = jnp.sum(dk, axis=(0, 1), dtype=jnp.float32).astype(bq_.dtype)
    dbv = jnp.sum(dv, axis=(0, 1), dtype=jnp.float32).astype(bq_.dtype)
    dx_qk = dq @ wq.T + dk @ wk.T
    dx_v = dv @ wv.T
    return (dx_qk, dx_v, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo,
            np.zeros((1,), jax.dtypes.float0))


fused_mha.defvjp(fwd=_fwd_rule, bwd=_bwd_rule)

"""Fused point-token builder: VMEM-resident gather + scatter-free backward.

This is the round-5 replacement for the XLA gather path inside
``GroupedBNReluMax`` (reference hot loop: the ``grouping -> BatchNorm1d ->
ReLU -> max`` tail of `src/models/components/act/act.py:457-460`). It
computes, for a padded cloud of projected features ``g = src @ W`` (B, N, D)
and projected query offsets ``h = query @ W`` (B, M, D) with kNN indices
``nn_idx`` (B, M, K):

    vmax[m]     = max_k  where(hole, -inf, g[nn[m,k]] - h[m])
    vmin[m]     = min_k  where(hole, +inf, g[nn[m,k]] - h[m])
    total[d]    = sum over non-hole (m,k) of (g[nn]-h)        (f32)
    total_sq[d] = sum over non-hole (m,k) of (g[nn]-h)^2      (f32)

without ever materializing the (B, M, K, D) neighborhood tensor (1.07 GB at
the flagship shape; XLA's gather+scatter over it measures 72.7 ms/step —
PERF.md).

Forward design (Pallas, TPU):
  * ``g`` is bf16-rounded, then chunk-transposed to (N/128, D, 128) f32 by
    an MXU identity matmul (``_chunk_transpose`` — 1.5 ms where XLA's
    vector transpose measures 8+; values stay exactly bf16-representable,
    so the in-kernel bf16 casts are lossless and the arithmetic matches
    the unfused chain bit-for-bit). The per-item block (21 MB at N=10240,
    D=512) stays VMEM-resident across the whole query grid (v5e has
    headroom past the default 16 MB scoped cap).
  * Queries are sorted by their first kNN index (a Morton-locality proxy:
    the cloud itself is Morton-ordered by the collate), so a block of 128
    queries' 128*K neighbor indices touch ~21 of the 80 point-chunks
    instead of ~67 (scripts/study_builder_locality.py).
  * A data-dependent ``while_loop`` visits exactly the chunks the block
    needs: the next chunk is the min over not-yet-gathered index chunks
    (a vector-reduce-to-``pl.ds``-scalar pattern this toolchain now
    compiles — round-5 probe), and each visit gathers with a 128-lane
    ``take_along_axis`` per k-tile merged by a write-only masked store.

PERF.md records where this lands: the forward is ~2x slower than XLA's
streaming gather (Mosaic per-gather overhead binds), so the fused path
pays off only through its scatter-free backward — it is the default for
data-source call sites (``grouped_stats_data``) and a measured loss for
learned-feature ones (``grouped_stats_core``, kept as an opt-in).

Backward design (scatter-free):
  Both ``g`` and ``h`` are linear projections of *data* (``src`` is the
  concatenated [coord, feat] cloud, ``query`` the [new_xyz, 0] offsets —
  neither needs a gradient), so the only cotangent owed is ``dW`` (Cin, D).
  Instead of materializing the dense ``dg`` (B, N, D) via a 23.8 ms
  scatter-add, dW factorizes:

    dx[m,k,d] = tie_max/cnt_max * dvmax + tie_min/cnt_min * dvmin
              + nonhole * (d_total[d] + 2 * x[m,k,d] * d_total_sq[d])

    dW = [routed term: small Pallas kernel over tie bitmaps]             (1)
       + 2 * sum_n r_n src[n] (x) (g[n] * d_total_sq)                    (2)
       - 2 * sum_m s_m (x) (h[m] * d_total_sq)                           (3)
       + (sum_{m,k} src[nn]) (x) d_total                                 (4)
    plus a closed-form dh cotangent, so the caller's own h = query @ W
    projection picks up the query-side dW under ordinary autodiff.

  where r_n is the index multiplicity histogram, s_m = sum_k src[nn[m,k]]
  (a K-sum of 9-dim rows), and dh is a closed-form elementwise expression
  using sg[m] = sum_k g[nn[m,k]] saved from the forward. Terms (2)-(5) are
  tiny einsums; term (1) needs the per-(m,k,d) tie structure and runs as a
  second small kernel over the forward's saved tie bitmaps (max ties in
  bits 0..K-1, min ties in bits 16..16+K-1 of one int32 per (m,d)).
  Tie gradients are split evenly among tied neighbors, matching XLA's
  ``reduce_max`` VJP (verified: scripts/probe_mosaic_r5d.py), which also
  covers the reference's repeated-neighbor padding quirk.

``grouped_stats_data`` wraps all of this in a ``jax.custom_vjp`` whose
``src`` cotangent is defined as zero — call sites must treat the source
rows as data (the ACT/DP call sites apply ``stop_gradient``; they route
here only for ``pre_sample`` clouds and frozen backbones).
``grouped_stats_core`` is the learned-feature variant with a real dense
``dg`` — correct but measured slower than XLA autodiff of the unfused
chain (see PERF.md), so it stays opt-in.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30
_LANES = 128


# ---------------------------------------------------------------------------
# Eligibility
# ---------------------------------------------------------------------------
def fused_builder_supported(n: int, m: int, k: int, d: int) -> bool:
    """Shape gate for the Pallas path.

    D must tile as bf16 (mult of 16) and pack in pairs; K <= 16 so max+min
    tie bits fit one int32; the packed per-item g (ceil(N/128)*D/2*128*4 B)
    must leave room in ~16 MB VMEM for scratch + blocks (~4 MB).
    """
    if k > 16 or d % 16 != 0 or d < 128:
        return False
    c = -(-n // _LANES)
    resident = c * d * _LANES * 4  # f32 chunk-transposed g
    return resident <= 24 * 2**20


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------
def _fwd_kernel(idx_ref, ht_ref, gp_ref, vmax_ref, vmin_ref, sg_ref, bm_ref,
                sums_ref, G_ref, *, K: int, D: int, SB: int):
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _init():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    tot_acc = jnp.zeros((D, _LANES), jnp.float32)
    tot2_acc = jnp.zeros((D, _LANES), jnp.float32)

    # SB statically-unrolled 128-query sub-blocks per grid step: fewer
    # pipeline steps amortize the per-step block I/O overhead.
    for sb in range(SB):
        lo = sb * _LANES
        idx = idx_ref[0][:, lo:lo + _LANES]  # (K, 128) int32, -1 = hole
        hole = idx < 0
        G_ref[...] = jnp.zeros_like(G_ref)  # holes stay zero (sg needs it)

        # One shared min-anchored loop over the union of chunks this
        # sub-block's K*128 indices touch; per (tile, visit) the merge is a
        # write-only MASKED store (each lane is written exactly once — by
        # its own chunk's visit), not a VMEM read-modify-write
        # (scripts/bench_taa_prims.py).
        def cond(carry):
            return carry[0] < _BIG

        def body(carry, idx=idx):
            c, st = carry
            win = gp_ref[0, c]  # (D, 128) f32 (bf16-exact values)
            base = c * _LANES
            for k in range(K):
                row = idx[k:k + 1]  # (1, 128)
                rel = jnp.clip(row - base, 0, _LANES - 1)
                inw = (row >> 7) == c
                got = jnp.take_along_axis(
                    win, jnp.broadcast_to(rel, (D, _LANES)), axis=1
                )
                pltpu.store(
                    G_ref.at[k], got,
                    mask=jnp.broadcast_to(inw, (D, _LANES)),
                )
            st = jnp.where(st == c, _BIG, st)
            return (jnp.min(st), st)

        st0 = jnp.where(hole, _BIG, idx >> 7)
        lax.while_loop(cond, body, (jnp.min(st0), st0))

        # g/h arrive as f32 holding exactly-bf16 values (rounded before the
        # MXU chunk-transpose), so the bf16 casts below are lossless and
        # the bf16 subtract reproduces the unfused path bit-for-bit.
        h = ht_ref[0, sb].astype(jnp.bfloat16)  # (D, 128)
        neg = jnp.asarray(-jnp.inf, jnp.bfloat16)
        pos = jnp.asarray(jnp.inf, jnp.bfloat16)
        vmax = jnp.full((D, _LANES), neg)
        vmin = jnp.full((D, _LANES), pos)
        sg = jnp.zeros((D, _LANES), jnp.float32)
        tot = jnp.zeros((D, _LANES), jnp.float32)
        tot2 = jnp.zeros((D, _LANES), jnp.float32)
        xks = []
        for k in range(K):
            gk = G_ref[k].astype(jnp.bfloat16)  # (D, 128), lossless
            xk = gk - h
            xks.append(xk)
            hk = jnp.broadcast_to(hole[k:k + 1], (D, _LANES))
            vmax = jnp.maximum(vmax, jnp.where(hk, neg, xk))
            vmin = jnp.minimum(vmin, jnp.where(hk, pos, xk))
            sg = sg + G_ref[k]
            xz = jnp.where(hk, jnp.bfloat16(0), xk).astype(jnp.float32)
            tot = tot + xz
            tot2 = tot2 + xz * xz
        bm = jnp.zeros((D, _LANES), jnp.int32)
        vmax32 = vmax.astype(jnp.float32)  # bf16 cmp miscompiles in the
        vmin32 = vmin.astype(jnp.float32)  # 2-packed layout; f32 eq exact
        for k in range(K):
            xk32 = xks[k].astype(jnp.float32)
            hk = jnp.broadcast_to(hole[k:k + 1], (D, _LANES))
            live = jnp.logical_not(hk)
            bit_max = jnp.int32(1) << jnp.int32(k)
            bit_min = jnp.int32(1) << jnp.int32(k + 16)  # k=15 -> sign bit
            bm = bm + jnp.where(live & (xk32 == vmax32), bit_max, 0)
            bm = bm + jnp.where(live & (xk32 == vmin32), bit_min, 0)

        vmax_ref[0, :, lo:lo + _LANES] = vmax
        vmin_ref[0, :, lo:lo + _LANES] = vmin
        sg_ref[0, :, lo:lo + _LANES] = sg.astype(jnp.bfloat16)
        bm_ref[0, :, lo:lo + _LANES] = bm
        tot_acc = tot_acc + tot
        tot2_acc = tot2_acc + tot2

    sums_ref[0, 0] = sums_ref[0, 0] + tot_acc
    sums_ref[0, 1] = sums_ref[0, 1] + tot2_acc


def _chunk_transpose(x: jax.Array) -> jax.Array:
    """(B, T, D) bf16 -> (B, T/128, D, 128) f32 via an MXU identity matmul.

    XLA's vector transpose of this layout measures 8+ ms at the flagship
    shape; contracting each 128-row chunk against a 128x128 identity makes
    the MXU emit the transposed blocks at memory speed (~2 ms). bf16 inputs
    with f32 accumulation keep every value exactly representable, so the
    result is the bit-exact transpose.
    """
    B, T, D = x.shape
    eye = jnp.eye(_LANES, dtype=jnp.bfloat16)
    return jnp.einsum(
        "bcjd,jl->bcdl", x.reshape(B, T // _LANES, _LANES, D), eye,
        preferred_element_type=jnp.float32,
    )


def _core_pallas(g, h_s, nn_s):
    """Sorted-domain core. g (B,N,D) bf16, h_s (B,M,D) bf16 (sorted),
    nn_s (B,M,K) int32 (sorted). Returns (vmax_s, vmin_s, sg_s, bm_s,
    total, total_sq) with the first four (B,M,D)-natural."""
    B, N, D = g.shape
    M, K = nn_s.shape[1], nn_s.shape[2]
    pad_n = (-N) % _LANES
    if pad_n:
        g = jnp.pad(g, ((0, 0), (0, pad_n), (0, 0)))
    gp = _chunk_transpose(g.astype(jnp.bfloat16))  # (B, C, D, 128) f32
    ht = _chunk_transpose(h_s.astype(jnp.bfloat16))  # (B, M/128, D, 128) f32
    nn_t = nn_s.transpose(0, 2, 1)  # (B, K, M)

    import os

    SB = int(os.environ.get("PCM_BUILDER_SB", "1"))
    while M % (SB * _LANES):
        SB //= 2
    lanes_blk = SB * _LANES
    grid = (B, M // lanes_blk)
    kernel = functools.partial(_fwd_kernel, K=K, D=D, SB=SB)
    vmax_t, vmin_t, sg_t, bm_t, sums = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K, lanes_blk), lambda b, m: (b, 0, m)),
            pl.BlockSpec((1, SB, D, _LANES), lambda b, m: (b, m, 0, 0)),
            pl.BlockSpec(
                (1, gp.shape[1], D, _LANES), lambda b, m: (b, 0, 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, D, lanes_blk), lambda b, m: (b, 0, m)),
            pl.BlockSpec((1, D, lanes_blk), lambda b, m: (b, 0, m)),
            pl.BlockSpec((1, D, lanes_blk), lambda b, m: (b, 0, m)),
            pl.BlockSpec((1, D, lanes_blk), lambda b, m: (b, 0, m)),
            pl.BlockSpec((1, 2, D, _LANES), lambda b, m: (b, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, M), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, D, M), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, D, M), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, D, M), jnp.int32),
            jax.ShapeDtypeStruct((B, 2, D, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, D, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # resident g + blocked outputs exceed the default 16 MB
            # scoped-vmem cap; v5e has headroom beyond it (same as fused_mha)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(nn_t, ht, gp)
    total = jnp.sum(sums[:, 0], axis=(0, -1))
    total_sq = jnp.sum(sums[:, 1], axis=(0, -1))

    def tr(t):  # (B, D, M) -> (B, M, D)
        return t.transpose(0, 2, 1)

    def tr_mxu(t):  # MXU identity transpose — finite bf16 values only
        # (a +/-inf entry would poison the f32 accumulation via 0*inf)
        eye = jnp.eye(D, dtype=jnp.bfloat16)
        out = jnp.einsum(
            "bdcl,dx->bclx", t.reshape(B, D, M // _LANES, _LANES),
            eye, preferred_element_type=jnp.float32,
        )
        return out.reshape(B, M, D).astype(t.dtype)

    return tr(vmax_t), tr(vmin_t), tr_mxu(sg_t), tr(bm_t), total, total_sq


def _core_xla(g, h_s, nn_s):
    """Reference core (CPU fallback / test oracle): same contract as
    ``_core_pallas`` but materializes the (B, M, K, D) gather."""
    from pointcloudmatters_tpu.ops.pointops import gather_rows_padded

    K = nn_s.shape[-1]
    hole = (nn_s < 0)[..., None]  # (B,M,K,1)
    gg = gather_rows_padded(g, nn_s)  # (B,M,K,D)
    gg = jnp.where(hole, jnp.zeros((), g.dtype), gg)
    x = gg - h_s[:, :, None, :].astype(g.dtype)
    # Force materialization in the declared dtype: TPU XLA keeps bf16
    # elementwise chains in f32 inside fusions, so without this barrier the
    # tie compare below sees UNROUNDED x while vmax/vmin are rounded at the
    # reduce output — dropping almost every tie bit (observed on v5e).
    # The Pallas core compares bf16-rounded values; this matches it.
    x = lax.optimization_barrier(x)
    neg = jnp.asarray(-jnp.inf, x.dtype)
    pos = jnp.asarray(jnp.inf, x.dtype)
    vmax = jnp.max(jnp.where(hole, neg, x), axis=2)
    vmin = jnp.min(jnp.where(hole, pos, x), axis=2)
    sg = jnp.sum(gg.astype(jnp.float32), axis=2).astype(g.dtype)
    xz = jnp.where(hole, jnp.zeros((), x.dtype), x)
    total = jnp.sum(xz, axis=(0, 1, 2), dtype=jnp.float32)
    total_sq = jnp.sum(xz * xz, axis=(0, 1, 2), dtype=jnp.float32)
    live = ~hole
    bm = jnp.sum(
        jnp.where(live & (x == vmax[:, :, None, :]),
                  (1 << jnp.arange(K, dtype=jnp.int32))[None, None, :, None],
                  0)
        + jnp.where(live & (x == vmin[:, :, None, :]),
                    (1 << (16 + jnp.arange(K, dtype=jnp.int32)))[
                        None, None, :, None],
                    0),
        axis=2, dtype=jnp.int32)
    return vmax, vmin, sg, bm, total, total_sq


# ---------------------------------------------------------------------------
# Backward: routed-dW kernel (term 1)
# ---------------------------------------------------------------------------
def _routed_kernel(inpg_ref, bm_ref, dvx_ref, dvn_ref, dw_ref, *, K: int):
    b = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when((b == 0) & (m == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    bm = bm_ref[0]  # (D, 128) int32
    dvx = dvx_ref[0]  # (D, 128) bf16 (dvmax / cnt_max)
    dvn = dvn_ref[0]
    for k in range(K):
        tbm = ((bm >> k) & 1).astype(jnp.bfloat16)
        tbn = ((bm >> (k + 16)) & 1).astype(jnp.bfloat16)
        w = tbm * dvx + tbn * dvn  # (D, 128)
        inpk = inpg_ref[0, k]  # (Ci, 128) bf16
        dw_ref[...] = dw_ref[...] + lax.dot_general(
            inpk, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _routed_dw_pallas(inpg_t, bm_t, dvx_t, dvn_t):
    """inpg_t (B,K,Ci,M) bf16; bm_t (B,D,M) int32; dvx_t/dvn_t (B,D,M) bf16
    -> (Ci, D) f32."""
    B, K, Ci, M = inpg_t.shape
    D = bm_t.shape[1]
    return pl.pallas_call(
        functools.partial(_routed_kernel, K=K),
        grid=(B, M // _LANES),
        in_specs=[
            pl.BlockSpec((1, K, Ci, _LANES), lambda b, m: (b, 0, 0, m)),
            pl.BlockSpec((1, D, _LANES), lambda b, m: (b, 0, m)),
            pl.BlockSpec((1, D, _LANES), lambda b, m: (b, 0, m)),
            pl.BlockSpec((1, D, _LANES), lambda b, m: (b, 0, m)),
        ],
        out_specs=pl.BlockSpec((Ci, D), lambda b, m: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Ci, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # resident packed g + blocked outputs exceed the default 16 MB
            # scoped-vmem cap; v5e has headroom beyond it (same as fused_mha)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(inpg_t, bm_t, dvx_t, dvn_t)


def _routed_dw_xla(inpg_t, bm_t, dvx_t, dvn_t):
    """Reference for the routed term (materializes (B,M,K,D) weights)."""
    B, K, Ci, M = inpg_t.shape
    karange = jnp.arange(K, dtype=jnp.int32)
    tbm = ((bm_t[:, None] >> karange[None, :, None, None]) & 1)
    tbn = ((bm_t[:, None] >> (16 + karange)[None, :, None, None]) & 1)
    w = (tbm.astype(jnp.float32) * dvx_t[:, None].astype(jnp.float32)
         + tbn.astype(jnp.float32) * dvn_t[:, None].astype(jnp.float32))
    # (B,K,D,M) x (B,K,Ci,M) -> (Ci, D)
    return jnp.einsum(
        "bkcm,bkdm->cd", inpg_t.astype(jnp.float32), w
    )


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------
def _popcount16(v: jax.Array) -> jax.Array:
    """Popcount of the low 16 bits of an int32 tensor."""
    v = v & 0xFFFF
    v = v - ((v >> 1) & 0x5555)
    v = (v & 0x3333) + ((v >> 2) & 0x3333)
    v = (v + (v >> 4)) & 0x0F0F
    return (v + (v >> 8)) & 0x1F


def _sort_queries(nn_idx: jax.Array):
    """Order queries by their first kNN index (Morton-locality proxy);
    all-hole (padding) queries sort last. Returns (order, inv_order)."""
    key = jnp.where(nn_idx[..., 0] < 0, jnp.int32(2**31 - 1), nn_idx[..., 0])
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    # Pin ONE materialization of the permutation. Without this, XLA (TPU)
    # can rematerialize the duplicate-key argsort separately for each
    # consumer, and the copies need not agree on tie order — the forward
    # then permutes nn/h with one permutation and un-permutes the outputs
    # with another (observed: ~95% of vmax wrong at the flagship shapes).
    order = lax.optimization_barrier(order)
    M = order.shape[1]
    inv = jnp.zeros_like(order).at[
        jnp.arange(order.shape[0])[:, None], order
    ].set(jnp.arange(M, dtype=jnp.int32)[None])
    return order, inv


def _take_q(t: jax.Array, order: jax.Array) -> jax.Array:
    """Permute axis 1 of (B, M, ...) by per-batch ``order``.

    Uses the flattened-batch single-gather trick (same rationale as
    ``gather_rows_padded``): the batched-gather HLO that take_along_axis
    emits measures ~4x slower on v5e for these row widths."""
    B, M = order.shape
    off = (jnp.arange(B, dtype=jnp.int32) * M)[:, None]
    flat = t.reshape((B * M,) + t.shape[2:])
    return jnp.take(flat, (order + off).reshape(-1), axis=0,
                    mode="clip").reshape(t.shape)


def _builder_fwd_impl(src, W, h, nn_idx, impl):
    g = src @ W  # (B, N, D)
    if impl == "pallas":  # the packed kernel is bf16-native
        g = g.astype(jnp.bfloat16)
        h = h.astype(jnp.bfloat16)
        vmax, vmin, sg, bm, total, total_sq = _sorted_core(g, h, nn_idx)
    else:
        vmax, vmin, sg, bm, total, total_sq = _core_xla(g, h, nn_idx)
    return vmax, vmin, sg, bm, total, total_sq, g


def _builder_bwd_impl(src, W, h, nn_idx, g, sg, bm,
                      dvmax, dvmin, dtot, dts, impl):
    """Shared backward math; returns (dW (Cin, D), dh (B, M, D)) f32."""
    from pointcloudmatters_tpu.ops.pointops import gather_rows_padded

    B, M, K = nn_idx.shape
    Cin, D = W.shape
    hole = nn_idx < 0  # (B, M, K)
    kv = jnp.sum(~hole, axis=-1).astype(jnp.float32)[..., None]  # (B,M,1)
    has = (kv > 0).astype(jnp.float32)
    f32 = jnp.float32

    # tie-count-normalized cotangents
    cnt_max = jnp.maximum(_popcount16(bm), 1).astype(f32)
    cnt_min = jnp.maximum(_popcount16(bm >> 16), 1).astype(f32)
    dvx = (dvmax.astype(f32) / cnt_max)
    dvn = (dvmin.astype(f32) / cnt_min)

    # gathered source rows (B, M, K, Ci), hole rows zeroed
    Ci = -(-Cin // 16) * 16
    srcp = src.astype(jnp.bfloat16)
    if Ci != Cin:
        srcp = jnp.pad(srcp, ((0, 0), (0, 0), (0, Ci - Cin)))
    inpg = gather_rows_padded(srcp, nn_idx)
    inpg = jnp.where(hole[..., None], jnp.bfloat16(0), inpg)

    # (1) routed term
    if impl == "pallas":
        pad_m = (-M) % _LANES
        pad = lambda t: (jnp.pad(t, ((0, 0), (0, pad_m)) + ((0, 0),) * (t.ndim - 2))
                         if pad_m else t)
        inpg_t = pad(inpg).transpose(0, 2, 3, 1)  # (B,K,Ci,M)
        dw_routed = _routed_dw_pallas(
            inpg_t,
            pad(bm).transpose(0, 2, 1),
            pad(dvx.astype(jnp.bfloat16)).transpose(0, 2, 1),
            pad(dvn.astype(jnp.bfloat16)).transpose(0, 2, 1),
        )
    else:
        dw_routed = _routed_dw_xla(
            inpg.transpose(0, 2, 3, 1),
            bm.transpose(0, 2, 1),
            dvx.astype(jnp.bfloat16).transpose(0, 2, 1),
            dvn.astype(jnp.bfloat16).transpose(0, 2, 1),
        )
    dw_routed = dw_routed[:Cin]

    # (2) multiplicity-weighted g term: 2 sum_n r_n src[n] (x) g[n]*dts
    safe = jnp.where(hole, 0, nn_idx)
    r = jnp.zeros((B, g.shape[1]), f32).at[
        jnp.arange(B)[:, None, None], safe
    ].add(jnp.where(hole, 0.0, 1.0))
    dw_g = 2.0 * jnp.einsum(
        "bn,bni,bnd->id", r, src.astype(f32), g.astype(f32)
    ) * dts[None, :]

    # (3) h term: -2 sum_m s_m (x) h[m]*dts ; s_m = sum_k src[nn[m,k]]
    s = jnp.sum(inpg.astype(f32), axis=2)[..., :Cin]  # (B, M, Cin)
    dw_h_stats = -2.0 * jnp.einsum(
        "bmi,bmd->id", s, h.astype(f32)
    ) * dts[None, :]

    # (4) d_total term
    dw_tot = jnp.sum(s, axis=(0, 1))[:, None] * dtot[None, :]

    # dh is returned as a real cotangent; the query-side dW contribution
    # (query^T dh) then flows through the caller's own h = query @ W matmul
    # under ordinary autodiff.
    dh = -(has * (dvmax.astype(f32) + dvmin.astype(f32))
           + kv * dtot[None, None, :]
           + 2.0 * dts[None, None, :]
           * (sg.astype(f32) - kv * h.astype(f32)))

    dW = dw_routed + dw_g + dw_h_stats + dw_tot
    return dW.astype(W.dtype), dh.astype(h.dtype)


def _make_builder(impl: str):
    @jax.custom_vjp
    def builder(src, W, h, nn_idx):
        vmax, vmin, sg, bm, total, total_sq, _ = _builder_fwd_impl(
            src, W, h, nn_idx, impl
        )
        return vmax, vmin, total, total_sq

    def fwd(src, W, h, nn_idx):
        vmax, vmin, sg, bm, total, total_sq, g = _builder_fwd_impl(
            src, W, h, nn_idx, impl
        )
        return (vmax, vmin, total, total_sq), (
            src, W, h, nn_idx, g, sg, bm
        )

    def bwd(res, cots):
        src, W, h, nn_idx, g, sg, bm = res
        dvmax, dvmin, dtot, dts = cots
        dW, dh = _builder_bwd_impl(
            src, W, h, nn_idx, g, sg, bm,
            dvmax, dvmin, dtot.astype(jnp.float32),
            dts.astype(jnp.float32), impl,
        )
        return (jnp.zeros_like(src), dW, dh, None)

    builder.defvjp(fwd, bwd)
    return builder


_BUILDERS = {impl: _make_builder(impl) for impl in ("pallas", "xla")}


def _flat_scatter_add(target, idx, values, hole):
    """target (B,N,D) += values (B,M,K,D) at rows idx (B,M,K); holes dropped.
    Uses the same flattened-batch trick as ``gather_rows_padded``."""
    B, N, D = target.shape
    off = (jnp.arange(B, dtype=jnp.int32) * N).reshape(B, 1, 1)
    safe = jnp.where(hole, 0, idx) + off
    v = jnp.where(hole[..., None], jnp.zeros((), values.dtype), values)
    flat = target.reshape(B * N, D).at[safe.reshape(-1)].add(
        v.reshape(-1, D), mode="drop"
    )
    return flat.reshape(B, N, D)


def _multiplicity(nn_idx, n: int):
    """r (B, N) f32: how many (m, k) slots reference each source row."""
    B = nn_idx.shape[0]
    hole = nn_idx < 0
    off = (jnp.arange(B, dtype=jnp.int32) * n).reshape(B, 1, 1)
    safe = jnp.where(hole, 0, nn_idx) + off
    ones = jnp.where(hole, 0.0, 1.0)
    return (
        jnp.zeros((B * n,), jnp.float32)
        .at[safe.reshape(-1)]
        .add(ones.reshape(-1), mode="drop")
        .reshape(B, n)
    )


def _make_core(impl: str):
    """Universal fused-forward builder on the (g, h, nn_idx) boundary.

    Unlike ``grouped_stats_data`` (which is only valid when the projected
    inputs are data), this returns a REAL dense ``dg`` — required whenever
    ``g`` carries learned per-point features (the flagship's unfrozen
    PointNet path, `act/act.py:352-357`). The backward is gather-free: the
    only O(B*M*K*D) op is ONE scatter-add, because the ``2*x*d_total_sq``
    term splits into a ``-2*dts*h[m]`` part (folded into the scattered
    values) and a ``2*dts*r_n*g[n]`` part (index-multiplicity histogram):

        dg[n] = sum_{(m,k):nn=n} [tie_part[m,k] + dtot - 2*dts*h[m]]
              + 2*dts * r_n * g[n]
    """

    @jax.custom_vjp
    def core(g, h, nn_idx):
        if impl == "pallas":
            vmax, vmin, _, _, total, total_sq = _sorted_core(g, h, nn_idx)
        else:
            vmax, vmin, _, _, total, total_sq = _core_xla(g, h, nn_idx)
        return vmax, vmin, total, total_sq

    def fwd(g, h, nn_idx):
        if impl == "pallas":
            vmax, vmin, sg, bm, total, total_sq = _sorted_core(g, h, nn_idx)
        else:
            vmax, vmin, sg, bm, total, total_sq = _core_xla(g, h, nn_idx)
        return (vmax, vmin, total, total_sq), (g, h, nn_idx, sg, bm)

    def bwd(res, cots):
        g, h, nn_idx, sg, bm = res
        dvmax, dvmin, dtot, dts = cots
        f32 = jnp.float32
        dtot = dtot.astype(f32)
        dts = dts.astype(f32)
        B, M, K = nn_idx.shape
        hole = nn_idx < 0
        kv = jnp.sum(~hole, axis=-1).astype(f32)[..., None]  # (B, M, 1)
        has = (kv > 0).astype(f32)

        cnt_max = jnp.maximum(_popcount16(bm), 1).astype(f32)
        cnt_min = jnp.maximum(_popcount16(bm >> 16), 1).astype(f32)
        dvx = dvmax.astype(f32) / cnt_max  # (B, M, D)
        dvn = dvmin.astype(f32) / cnt_min

        karange = jnp.arange(K, dtype=jnp.int32)[None, None, :, None]
        tbm = ((bm[:, :, None, :] >> karange) & 1).astype(f32)
        tbn = ((bm[:, :, None, :] >> (karange + 16)) & 1).astype(f32)
        # scattered values: tie routing + dtot - 2*dts*h[m] (the g-part of
        # the 2*x*dts term is added below via the multiplicity histogram);
        # values and accumulation in g.dtype — the dtype plain autodiff
        # would scatter dg in — which also halves the scatter bandwidth
        # under mixed precision
        v = (tbm * dvx[:, :, None, :] + tbn * dvn[:, :, None, :]
             + dtot[None, None, None, :]
             - 2.0 * dts[None, None, None, :] * h.astype(f32)[:, :, None, :])
        dg = _flat_scatter_add(
            jnp.zeros(g.shape, g.dtype), nn_idx,
            v.astype(g.dtype), hole,
        ).astype(f32)
        r = _multiplicity(nn_idx, g.shape[1])  # (B, N)
        dg = dg + 2.0 * dts[None, None, :] * r[..., None] * g.astype(f32)

        dh = -(has * (dvmax.astype(f32) + dvmin.astype(f32))
               + kv * dtot[None, None, :]
               + 2.0 * dts[None, None, :]
               * (sg.astype(f32) - kv * h.astype(f32)))
        return dg.astype(g.dtype), dh.astype(h.dtype), None

    core.defvjp(fwd, bwd)
    return core


def _sorted_core(g, h, nn_idx):
    """Morton-sort queries, run the Pallas core, un-sort the outputs."""
    B, M, K = nn_idx.shape
    pad_m = (-M) % _LANES
    nn_p = nn_idx
    h_pad = h
    if pad_m:
        nn_p = jnp.pad(nn_idx, ((0, 0), (0, pad_m), (0, 0)),
                       constant_values=-1)
        h_pad = jnp.pad(h, ((0, 0), (0, pad_m), (0, 0)))
    order, inv = _sort_queries(nn_p)
    nn_s = _take_q(nn_p, order)
    h_s = _take_q(h_pad, order)
    vmax_s, vmin_s, sg_s, bm_s, total, total_sq = _core_pallas(
        g.astype(jnp.bfloat16), h_s.astype(jnp.bfloat16), nn_s
    )
    vmax = _take_q(vmax_s, inv)[:, :M]
    vmin = _take_q(vmin_s, inv)[:, :M]
    sg = _take_q(sg_s, inv)[:, :M]
    bm = _take_q(bm_s, inv)[:, :M]
    return vmax, vmin, sg, bm, total, total_sq


_CORES = {impl: _make_core(impl) for impl in ("pallas", "xla")}


def grouped_stats_core(g, h, nn_idx, impl: str = "pallas"):
    """Fused-forward builder statistics with a full dense-``dg`` backward.

    g (B, N, D), h (B, M, D), nn_idx (B, M, K) int32 (-1 = hole) ->
    (vmax, vmin, total, total_sq) for x = g[nn] - h. Use this boundary when
    ``g``/``h`` carry gradients (learned per-point features); use
    ``grouped_stats_data`` when they are projections of pure data (its
    backward then avoids the dense scatter entirely).
    """
    return _CORES[impl](g, h, nn_idx)


def grouped_stats_data(src, W, h, nn_idx, impl: str = "pallas"):
    """Fused token-builder statistics with a scatter-free backward.

    src (B, N, Cin), W (Cin, D), h (B, M, D), nn_idx (B, M, K) int32
    (-1 = hole) -> (vmax (B,M,D), vmin (B,M,D), total (D,) f32,
    total_sq (D,) f32) for x = (src@W)[nn] - h.

    IMPORTANT: ``src`` receives a ZERO cotangent — this boundary is only
    valid when the per-point source rows are pure data (pre_sample paths,
    frozen backbones); callers should ``stop_gradient`` src to make that
    explicit. ``W`` gets the factorized dW (no dense dg scatter) and ``h``
    a closed-form dh, so the caller's own ``h = query @ W`` projection
    picks up the query-side dW under ordinary autodiff. Use
    ``grouped_stats_core`` when the source features are learned.
    """
    return _BUILDERS[impl](src, W, h, nn_idx)

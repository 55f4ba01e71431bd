"""Flash-attention adapter for ``flax.linen.MultiHeadDotProductAttention``.

``make_flash_attention_fn()`` builds a drop-in ``attention_fn`` so the ACT
transformer keeps flax's qkv/out projections (parameter- and checkpoint-
compatible with the dense path) while the attention core runs the Pallas
flash kernel from :mod:`pointcloudmatters_tpu.ops.flash_attention` — never
materializing the (B, H, L, L) probability tensor in HBM. Attention-weight
dropout happens *inside* the kernel with broadcast semantics (mask shared
across batch and heads), matching the dense path's
``broadcast_dropout=True``.

Replaces the reference's torch scaled-dot-product attention over point-token
sequences (reference ``src/models/components/act/transformer.py``) where the
sequence is long enough for HBM traffic to dominate.

The adapter falls back to ``nn.dot_product_attention`` when:
- not running on TPU (CPU tests, the virtual-mesh dryrun),
- ``PCM_DISABLE_PALLAS=1``,
- the sequence is short (kernel launch + padding overheads beat the HBM win),
- it receives features the kernel doesn't model (additive bias, per-query
  masks, per-element dropout).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloudmatters_tpu.ops.flash_attention import (
    BlockSizes,
    SegmentIds,
    flash_attention,
)

__all__ = [
    "make_flash_attention_fn",
    "make_oneshot_attention_fn",
    "FLASH_TILE",
    "flash_token_padding",
]

# default (q, kv) tile edge; also the alignment callers can pre-pad to so the
# adapter's per-layer pad/slice becomes a no-op (see TransformerEncoder)
FLASH_TILE = 512


def flash_token_padding(seq_len: int) -> int:
    """Padded sequence length the flash path would use for ``seq_len``."""
    return -(-seq_len // FLASH_TILE) * FLASH_TILE


def _block_sizes(bq: int, bk: int) -> BlockSizes:
    """One drop-tile shape across fwd/dkv/dq — required for in-kernel dropout
    (the backward kernels regenerate the forward masks per tile)."""
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )


def _pallas_enabled() -> bool:
    return (
        jax.default_backend() == "tpu"
        and os.environ.get("PCM_DISABLE_PALLAS", "0") not in ("1", "true")
    )


def make_oneshot_attention_fn(block_q: int = 256, min_seq_len: int = 512):
    """``attention_fn`` backed by the one-shot whole-row kernel
    (:mod:`pointcloudmatters_tpu.ops.oneshot_attention`).

    Best backend for the ACT encoder regime (L ≈ 1k-4k, d_head 64): the full
    key row fits VMEM, so exact softmax runs on-chip with zero (B, H, L, L)
    HBM traffic — measured 2.9x over XLA dense fwd+bwd at the flagship shape.
    Falls back to ``nn.dot_product_attention`` off-TPU, for short sequences,
    and for features the kernel doesn't model (bias, per-query masks,
    per-element dropout, key-padding masks).
    """
    from pointcloudmatters_tpu.ops.oneshot_attention import oneshot_attention

    def attention_fn(
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        bias: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        broadcast_dropout: bool = True,
        dropout_rng: Optional[jax.Array] = None,
        dropout_rate: float = 0.0,
        deterministic: bool = False,
        dtype: Optional[Any] = None,
        precision: Any = None,
        module: Optional[nn.Module] = None,
        **unused: Any,
    ) -> jax.Array:
        B, Lq, H, Dh = query.shape
        Lk = key.shape[1]
        use_dropout = (
            dropout_rate > 0.0 and not deterministic and dropout_rng is not None
        )
        if (
            not _pallas_enabled()
            or bias is not None
            or mask is not None  # ACT's PCD encoder never masks; CVAE -> dense
            or (use_dropout and not broadcast_dropout)
            or Lk < min_seq_len  # the key row is what the kernel amortizes
        ):
            return nn.dot_product_attention(
                query, key, value, bias=bias, mask=mask,
                broadcast_dropout=broadcast_dropout, dropout_rng=dropout_rng,
                dropout_rate=dropout_rate, deterministic=deterministic,
                dtype=dtype, precision=precision, module=module,
            )
        seed = (
            jax.lax.bitcast_convert_type(
                jax.random.bits(dropout_rng, (1,), "uint32"), jnp.int32
            )
            if use_dropout else jnp.zeros((1,), jnp.int32)
        )
        q = jnp.swapaxes(query, 1, 2)  # (B, H, L, Dh)
        k = jnp.swapaxes(key, 1, 2)
        v = jnp.swapaxes(value, 1, 2)
        out = oneshot_attention(
            q, k, v, seed, Dh ** -0.5,
            dropout_rate if use_dropout else 0.0, block_q,
        )
        return jnp.swapaxes(out, 1, 2).astype(dtype or query.dtype)

    return attention_fn


def make_flash_attention_fn(
    block_q: int = FLASH_TILE, block_k: int = FLASH_TILE,
    min_seq_len: int = 1024,
):
    """Returns an ``attention_fn`` for ``nn.MultiHeadDotProductAttention``.

    ``min_seq_len``: route sequences shorter than this (query or key side) to
    the dense path — the ACT decoder (~chunk_size queries) and the CVAE
    posterior encoder are tiny, and padding them to a 512 tile would cost more
    than the flash kernel saves.
    """

    def attention_fn(
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        bias: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        broadcast_dropout: bool = True,
        dropout_rng: Optional[jax.Array] = None,
        dropout_rate: float = 0.0,
        deterministic: bool = False,
        dtype: Optional[Any] = None,
        precision: Any = None,
        module: Optional[nn.Module] = None,
        **unused: Any,
    ) -> jax.Array:
        B, Lq, H, Dh = query.shape
        Lk = key.shape[1]
        use_dropout = (
            dropout_rate > 0.0 and not deterministic and dropout_rng is not None
        )
        supported_mask = mask is None or (
            mask.ndim == 4 and mask.shape[-2] == 1  # key-padding only
        )
        if (
            not _pallas_enabled()
            or bias is not None
            or not supported_mask
            or (use_dropout and not broadcast_dropout)
            or min(Lq, Lk) < min_seq_len
        ):
            return nn.dot_product_attention(
                query, key, value, bias=bias, mask=mask,
                broadcast_dropout=broadcast_dropout, dropout_rng=dropout_rng,
                dropout_rate=dropout_rate, deterministic=deterministic,
                dtype=dtype, precision=precision, module=module,
            )

        bq, bk = min(block_q, Lq), min(block_k, Lk)
        lq_pad = -(-Lq // bq) * bq
        lk_pad = -(-Lk // bk) * bk

        def bhld(x, l_pad):
            x = jnp.swapaxes(x, 1, 2)  # (B, H, L, Dh)
            pad = l_pad - x.shape[2]
            if pad:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
            return x

        q = bhld(query, lq_pad)
        k = bhld(key, lk_pad)
        v = bhld(value, lk_pad)

        segment_ids = None
        if mask is not None or lk_pad != Lk:
            if mask is not None:
                kv_valid = mask[:, 0, 0, :].astype(jnp.int32)  # True = attend
            else:
                kv_valid = jnp.ones((B, Lk), jnp.int32)
            kv_ids = jnp.pad(kv_valid, ((0, 0), (0, lk_pad - Lk)))
            segment_ids = SegmentIds(
                q=jnp.ones((B, lq_pad), jnp.int32), kv=kv_ids
            )

        seed = None
        if use_dropout:
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(dropout_rng, (1,), "uint32"), jnp.int32
            )

        out = flash_attention(
            q, k, v,
            segment_ids=segment_ids,
            causal=False,
            sm_scale=Dh ** -0.5,
            dropout_rate=dropout_rate if use_dropout else 0.0,
            dropout_seed=seed,
            block_sizes=_block_sizes(bq, bk),
        )
        out = jnp.swapaxes(out[:, :, :Lq, :], 1, 2)  # (B, Lq, H, Dh)
        return out.astype(dtype or query.dtype)

    return attention_fn

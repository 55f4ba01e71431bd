"""Torch -> flax weight-porting helpers for the reference-parity tests.

Maps the reference's torch module parameters onto our flax param trees:
- ``nn.Linear(weight (out,in), bias)``     -> ``Dense {kernel (in,out), bias}``
- ``nn.LayerNorm(weight, bias)``           -> ``LayerNorm {scale, bias}``
- ``nn.MultiheadAttention(in_proj_*, out_proj)`` ->
  ``MultiHeadDotProductAttention {query,key,value,out}`` DenseGeneral trees
- ``nn.BatchNorm1d`` -> ``MaskedBatchNorm`` params + batch_stats
- DETR ``Transformer`` / ``TransformerEncoder`` stacks -> our batch-first
  modules (`pointcloudmatters_tpu/models/components/act/transformer.py`)
"""

from __future__ import annotations

import numpy as np

from pointcloudmatters_tpu.utils import torch_layouts as TL


def t2n(t) -> np.ndarray:
    return t.detach().cpu().numpy()


def port_linear(lin) -> dict:
    out = {"kernel": TL.linear_kernel(t2n(lin.weight))}
    if lin.bias is not None:
        out["bias"] = t2n(lin.bias)
    return out


def port_layernorm(ln) -> dict:
    return {"scale": t2n(ln.weight), "bias": t2n(ln.bias)}


def port_embedding(emb) -> np.ndarray:
    return t2n(emb.weight)


def port_mha(mha, nhead: int) -> dict:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention tree
    (layout math: utils/torch_layouts.py)."""
    tree = TL.mha_in_proj(t2n(mha.in_proj_weight), t2n(mha.in_proj_bias), nhead)
    tree["out"] = TL.mha_out_proj(
        t2n(mha.out_proj.weight), t2n(mha.out_proj.bias), nhead
    )
    return tree


def port_batchnorm1d(bn) -> tuple[dict, dict]:
    """-> (params {scale,bias}, batch_stats {mean,var}) for MaskedBatchNorm."""
    params = {"scale": t2n(bn.weight), "bias": t2n(bn.bias)}
    stats = {"mean": t2n(bn.running_mean), "var": t2n(bn.running_var)}
    return params, stats


def port_encoder_layer(layer, nhead: int) -> dict:
    return {
        "self_attn": port_mha(layer.self_attn, nhead),
        "linear1": port_linear(layer.linear1),
        "linear2": port_linear(layer.linear2),
        "norm1": port_layernorm(layer.norm1),
        "norm2": port_layernorm(layer.norm2),
    }


def port_decoder_layer(layer, nhead: int) -> dict:
    return {
        "self_attn": port_mha(layer.self_attn, nhead),
        "multihead_attn": port_mha(layer.multihead_attn, nhead),
        "linear1": port_linear(layer.linear1),
        "linear2": port_linear(layer.linear2),
        "norm1": port_layernorm(layer.norm1),
        "norm2": port_layernorm(layer.norm2),
        "norm3": port_layernorm(layer.norm3),
    }


def port_transformer_encoder(enc, nhead: int) -> dict:
    """Reference TransformerEncoder (`act/transformer.py:118-158`) -> ours."""
    tree = {
        f"layers_{i}": port_encoder_layer(layer, nhead)
        for i, layer in enumerate(enc.layers)
    }
    if enc.norm is not None:
        tree["norm"] = port_layernorm(enc.norm)
    return tree


def port_transformer(tr, nhead: int) -> dict:
    """Reference DETR Transformer (`act/transformer.py:16-115`) -> ours."""
    dec = {
        f"layers_{i}": port_decoder_layer(layer, nhead)
        for i, layer in enumerate(tr.decoder.layers)
    }
    dec["norm"] = port_layernorm(tr.decoder.norm)
    return {
        "encoder": port_transformer_encoder(tr.encoder, nhead),
        "decoder": dec,
    }


def port_act_common(model, nhead: int) -> tuple[dict, dict]:
    """Shared ACT parameters (`act/act.py:92-136`) -> (params, batch_stats).

    Covers the CVAE projections, heads, embeddings, and both transformer
    stacks. Callers add the backbone / pcd-specific leaves.
    """
    params = {
        "cls_embed": port_embedding(model.cls_embed),
        "query_embed": port_embedding(model.query_embed),
        "additional_pos_embed": port_embedding(model.additional_pos_embed),
        "encoder_action_proj": port_linear(model.encoder_action_proj),
        "encoder_joint_proj": port_linear(model.encoder_joint_proj),
        "latent_proj": port_linear(model.latent_proj),
        "latent_out_proj": port_linear(model.latent_out_proj),
        "input_proj_robot_state": port_linear(model.input_proj_robot_state),
        "action_head": port_linear(model.action_head),
        "is_pad_head": port_linear(model.is_pad_head),
        "transformer": port_transformer(model.transformer, nhead),
        "encoder": port_transformer_encoder(model.encoder, nhead),
    }
    if getattr(model, "goal_cond_dim", 0) > 0:
        params["proj_goal_cond_emb"] = port_linear(model.proj_goal_cond_emb)
    batch_stats = {}
    return params, batch_stats


def port_conv1d(conv) -> dict:
    """torch Conv1d (out,in,k) -> flax Conv {kernel (k,in,out)}."""
    out = {"kernel": TL.conv1d_kernel(t2n(conv.weight))}
    if conv.bias is not None:
        out["bias"] = t2n(conv.bias)
    return out


def port_groupnorm(gn) -> dict:
    return {"scale": t2n(gn.weight), "bias": t2n(gn.bias)}

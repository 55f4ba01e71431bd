"""Component-level wall-clock breakdown of the flagship ACT+pcd train step.

Times each stage of the hot path (FPS, kNN, grouping+token build, PointNet,
transformer fwd+bwd, full step) in isolation on the current backend, with
proper host syncs. Use to target optimization work; not part of the bench.

Run: python scripts/profile_step.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import build_batch, build_flagship

B = 32
N = 10240
M = 2048
K = 16


def timeit(name, fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # scalar fetch forces a sync even through the tunnel
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    rng = np.random.RandomState(0)
    coord = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 0.4 - 0.2)
    feat = jnp.asarray(rng.rand(B, N, 6).astype(np.float32))
    valid = jnp.ones((B, N), bool)

    from pointcloudmatters_tpu.ops.pointops import (
        farthest_point_sampling_padded,
        grouping_padded,
        knn_query_padded,
    )

    # --- FPS ---
    fps = jax.jit(lambda c, v: farthest_point_sampling_padded(c, v, M))
    timeit("fps (B=32,N=10240,m=2048)", fps, coord, valid)

    idx = fps(coord, valid)
    new_xyz = jnp.take_along_axis(coord, idx[..., None], axis=1)

    # --- kNN ---
    knn = jax.jit(lambda q, c, v: knn_query_padded(q, c, v, K)[0])
    timeit("knn (M=2048,N=10240,k=16)", knn, new_xyz, coord, valid)
    nn_idx = knn(new_xyz, coord, valid)

    # --- grouping of backbone features (the 515-wide gather) ---
    feats512 = jnp.asarray(rng.rand(B, N, 512).astype(np.float32))
    group = jax.jit(
        lambda i, f, c, q: grouping_padded(i, f, c, q, with_xyz=True)
    )
    timeit("group gather (B,M,K,515)", group, nn_idx, feats512, coord, new_xyz)

    # --- token builder fwd+bwd (gather -> Dense -> BN -> relu -> max) ---
    from flax import linen as nn

    from pointcloudmatters_tpu.models.components.nn_utils import MaskedBatchNorm

    class TokenBuilder(nn.Module):
        @nn.compact
        def __call__(self, grouped, train=True):
            x = nn.Dense(512, use_bias=False)(grouped)
            x = MaskedBatchNorm()(x, use_running_average=not train)
            x = jax.nn.relu(x)
            return jnp.max(x, axis=2)

    tb = TokenBuilder()
    grouped = group(nn_idx, feats512, coord, new_xyz)
    tvars = tb.init(jax.random.PRNGKey(0), grouped)

    def tb_loss(params, grouped):
        out, _ = tb.apply(
            {"params": params["params"], "batch_stats": tvars["batch_stats"]},
            grouped, mutable=["batch_stats"],
        )
        return jnp.sum(out * out)

    tb_grad = jax.jit(jax.grad(tb_loss))
    timeit("token build fwd+bwd (Dense+BN+max)", tb_grad, tvars, grouped)

    # --- PointNet backbone fwd+bwd ---
    from pointcloudmatters_tpu.models.components.pcd_encoder.pointnet import (
        PointNet,
    )

    pn = PointNet(in_channels=6, dtype=jnp.bfloat16)
    pcd = {"feat": feat, "valid": valid}
    pvars = pn.init(jax.random.PRNGKey(0), pcd, train=True)

    def pn_loss(params, pcd):
        out, _ = pn.apply(
            {"params": params["params"], "batch_stats": pvars["batch_stats"]},
            pcd, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    pn_grad = jax.jit(jax.grad(pn_loss))
    timeit("pointnet fwd+bwd (N=10240)", pn_grad, pvars, pcd)

    # --- transformer enc(2051)+dec fwd+bwd ---
    from pointcloudmatters_tpu.models.components.act.transformer import (
        Transformer,
    )

    tr = Transformer(
        d_model=512, nhead=8, num_encoder_layers=4, num_decoder_layers=7,
        dim_feedforward=32, dropout=0.1, normalize_before=False,
        return_intermediate_dec=True, attention_impl="dense",
    )
    src = jnp.asarray(rng.rand(B, M, 512).astype(np.float32))
    latent = jnp.asarray(rng.rand(B, 512).astype(np.float32))
    proprio = jnp.asarray(rng.rand(B, 2, 512).astype(np.float32))
    qemb = jnp.asarray(rng.rand(100, 512).astype(np.float32))
    addpe = jnp.asarray(rng.rand(3, 512).astype(np.float32))
    pos = jnp.asarray(rng.rand(1, M, 512).astype(np.float32))
    trvars = tr.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        src, qemb, pos=pos, latent_input=latent, proprio_input=proprio,
        additional_pos_embed=addpe, deterministic=False,
    )

    def tr_loss(params, src):
        hs = tr.apply(
            params, src, qemb, pos=pos, latent_input=latent,
            proprio_input=proprio, additional_pos_embed=addpe,
            deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(hs[0].astype(jnp.float32) ** 2)

    tr_grad = jax.jit(jax.grad(tr_loss))
    timeit("transformer fwd+bwd (L=2051)", tr_grad, trvars, src)

    # --- full train step ---
    from pointcloudmatters_tpu.models.bc_module import BCModule
    from pointcloudmatters_tpu.trainer import Trainer

    policy = build_flagship()
    module = BCModule(
        policy=policy,
        optimizer={"type": "AdamW", "lr": 5e-5, "weight_decay": 0.05},
        lr_scheduler={"scheduler": {"type": "OneCycleLR", "max_lr": 5e-5,
                                    "pct_start": 0.1}},
    )
    trainer = Trainer(
        default_root_dir="/tmp/pcm_prof", max_epochs=1,
        precision="bf16-mixed", devices="auto",
    )
    batch = build_batch(batch_size=B, n_points=N)
    module.setup_module(
        type("Kn", (), {"estimated_stepping_batches": 10_000,
                        "gradient_clip_val": None,
                        "accumulate_grad_batches": 1,
                        "seed": 0})(),
        batch,
    )
    state = trainer._replicate(module.initial_state(batch))
    sharded = trainer.shard_batch(batch)
    step = trainer._build_train_step(module)

    def full(state):
        s, m = step(state, sharded)
        return m["loss"]

    timeit("FULL train step (B=32)", full, state, warmup=3)


if __name__ == "__main__":
    main()

"""Round-4 step budget: decompose the full flagship train step (B=32).

Times every major component at flagship shapes (B=32, N=10240 -> M=2048
tokens, K=16, D=512, L=2051) so the optimization work has an address.
Writes the budget to stdout; commit the output into PERF.md.

Run on the real chip: python scripts/profile_r4.py [full|parts|attn|all]
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

B, N, M, K, D = 32, 10240, 2048, 16, 512
L = M + 3  # latent + proprio + goal tokens


def timeit(name, fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:58s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()}  "
          f"PCM_KNN_IMPL={os.environ.get('PCM_KNN_IMPL', '<default>')}",
          flush=True)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    if which in ("all", "attn"):
        # attention core alone: (B, H, L, d) oneshot kernel fwd / fwd+bwd
        from pointcloudmatters_tpu.ops.oneshot_attention import (
            oneshot_attention,
        )

        H, Dh = 8, 64
        q = jnp.asarray(rng.randn(B, H, L, Dh), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, L, Dh), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, L, Dh), jnp.bfloat16)
        seed = jnp.zeros((1,), jnp.int32)
        scale = 1.0 / np.sqrt(Dh)

        f = jax.jit(lambda q, k, v: oneshot_attention(q, k, v, seed, scale, 0.0))
        timeit("oneshot core fwd (rate=0)", f, q, k, v)
        fd = jax.jit(lambda q, k, v: oneshot_attention(q, k, v, seed, scale, 0.1))
        timeit("oneshot core fwd (rate=0.1)", fd, q, k, v)

        def lossfn(q, k, v):
            return jnp.sum(
                oneshot_attention(q, k, v, seed, scale, 0.1).astype(jnp.float32)
            )

        g = jax.jit(jax.grad(lossfn, argnums=(0, 1, 2)))
        timeit("oneshot core fwd+bwd (rate=0.1)", g, q, k, v)

        g0 = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(
                oneshot_attention(q, k, v, seed, scale, 0.0).astype(jnp.float32)
            ), argnums=(0, 1, 2)))
        timeit("oneshot core fwd+bwd (rate=0)", g0, q, k, v)

    if which in ("all", "parts"):
        from pointcloudmatters_tpu.data.collate import morton_order
        from pointcloudmatters_tpu.ops.pointops import (
            farthest_point_sampling_padded,
            knn_query_padded,
        )

        coord_np = rng.rand(B, N, 3).astype(np.float32) * 0.4 - 0.2
        for b in range(B):
            coord_np[b] = coord_np[b][morton_order(coord_np[b])]
        coord = jnp.asarray(coord_np, jnp.bfloat16)
        valid = jnp.ones((B, N), bool)

        fps = jax.jit(lambda c, v: farthest_point_sampling_padded(c, v, M))
        timeit("FPS (10240 -> 2048)", fps, coord, valid)
        idx = fps(coord, valid)
        new_xyz = jnp.take_along_axis(coord, idx[..., None], axis=1)
        knn = jax.jit(lambda q, c, v: knn_query_padded(q, c, v, K)[0])
        timeit("kNN (morton-sorted, active impl)", knn, new_xyz, coord, valid)
        nn_idx = knn(new_xyz, coord, valid)

        # PointNet backbone fwd+bwd over the full padded cloud
        from pointcloudmatters_tpu.models.components.pcd_encoder.pointnet import (
            PointNet,
        )

        pn = PointNet(in_channels=6)
        pcd = {
            "coord": coord,
            "feat": jnp.asarray(rng.randn(B, N, 6), jnp.bfloat16),
            "valid": valid,
        }
        pvars = pn.init(key, pcd, train=True)

        def pn_loss(params, feat):
            out, _ = pn.apply(
                {**pvars, "params": params}, dict(pcd, feat=feat), train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        timeit("PointNet backbone fwd+bwd (B,N,6)->(B,N,512)",
               jax.jit(jax.grad(pn_loss, argnums=(0, 1))),
               pvars["params"], pcd["feat"])

        # token projection (pcd_linear on (B,N,515)) fwd+bwd
        w = jnp.asarray(rng.randn(515, D) * 0.02, jnp.bfloat16)
        feats515 = jnp.asarray(rng.randn(B, N, 515), jnp.bfloat16)

        def proj_loss(w, x):
            return jnp.sum(jnp.einsum("bnc,cd->bnd", x, w).astype(jnp.float32) ** 2)

        timeit("pcd_linear projection fwd+bwd (B,N,515)@(515,512)",
               jax.jit(jax.grad(proj_loss, argnums=(0, 1))), w, feats515)

        # fused token builder fwd+bwd
        from pointcloudmatters_tpu.models.components.nn_utils import (
            GroupedBNReluMax,
        )

        g_ = jnp.asarray(rng.randn(B, N, D).astype(np.float32), jnp.bfloat16)
        h_ = jnp.asarray(rng.randn(B, M, D).astype(np.float32), jnp.bfloat16)
        mod = GroupedBNReluMax()
        variables = mod.init(key, g_, h_, nn_idx, use_running_average=False)

        def gb_loss(g, h):
            y, _ = mod.apply(variables, g, h, nn_idx,
                             use_running_average=False,
                             mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2)

        timeit("GroupedBNReluMax fwd+bwd", jax.jit(jax.grad(gb_loss, argnums=(0, 1))),
               g_, h_)

        # full transformer (4 enc + 1 live dec) fwd+bwd at L=2051
        from pointcloudmatters_tpu.models.components.act.transformer import (
            Transformer,
        )

        tr = Transformer(
            d_model=D, nhead=8, num_encoder_layers=4, num_decoder_layers=7,
            dim_feedforward=32, dropout=0.1, normalize_before=False,
            return_intermediate_dec=True, attention_impl="oneshot",
        )
        src = jnp.asarray(rng.randn(B, M, D), jnp.bfloat16)
        pos = jnp.asarray(rng.randn(1, M, D), jnp.bfloat16)
        latent = jnp.asarray(rng.randn(B, D), jnp.bfloat16)
        proprio = jnp.asarray(rng.randn(B, 2, D), jnp.bfloat16)
        qe = jnp.asarray(rng.randn(100, D), jnp.bfloat16)
        ape = jnp.asarray(rng.randn(3, D), jnp.bfloat16)
        tvars = tr.init({"params": key, "dropout": key}, src, qe, pos=pos,
                        latent_input=latent, proprio_input=proprio,
                        additional_pos_embed=ape, deterministic=False)

        def tr_loss(params, src):
            p16 = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
            hs = tr.apply({"params": p16}, src, qe, pos=pos,
                          latent_input=latent, proprio_input=proprio,
                          additional_pos_embed=ape,
                          deterministic=False, rngs={"dropout": key})
            return jnp.sum(hs[0].astype(jnp.float32) ** 2)

        timeit("Transformer (4 enc + 1 dec live) fwd+bwd L=2051",
               jax.jit(jax.grad(tr_loss, argnums=(0, 1))),
               tvars["params"], src)

        # CVAE posterior encoder fwd+bwd (102 tokens)
        from pointcloudmatters_tpu.models.components.act.transformer import (
            TransformerEncoder,
        )

        enc = TransformerEncoder(d_model=D, nhead=8, dim_feedforward=32,
                                 num_layers=4, dropout=0.1)
        toks = jnp.asarray(rng.randn(B, 102, D), jnp.bfloat16)
        evars = enc.init({"params": key, "dropout": key}, toks,
                         deterministic=False)

        def enc_loss(params, toks):
            p16 = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
            out = enc.apply({"params": p16}, toks, deterministic=False,
                            rngs={"dropout": key})
            return jnp.sum(out.astype(jnp.float32) ** 2)

        timeit("CVAE posterior encoder fwd+bwd (B,102,512)",
               jax.jit(jax.grad(enc_loss, argnums=(0, 1))),
               evars["params"], toks)

    if which in ("all", "full"):
        from pointcloudmatters_tpu.models.bc_module import BCModule
        from pointcloudmatters_tpu.trainer import Trainer

        policy = build_flagship()
        module = BCModule(
            policy=policy,
            optimizer={"type": "AdamW", "lr": 5e-5, "weight_decay": 0.05},
            lr_scheduler={"scheduler": {"type": "OneCycleLR", "max_lr": 5e-5,
                                        "pct_start": 0.1}},
        )
        trainer = Trainer(default_root_dir="/tmp/pcm_prof", max_epochs=1,
                          precision="bf16-mixed", devices="auto")
        batch = build_batch(batch_size=B, n_points=N)
        module.setup_module(
            type("K", (), {"estimated_stepping_batches": 10_000,
                           "gradient_clip_val": None,
                           "accumulate_grad_batches": 1, "seed": 0})(), batch)
        state = trainer._replicate(module.initial_state(batch))
        sharded = trainer.shard_batch(batch)
        step = trainer._build_train_step(module)

        st = state

        def full2(b):
            nonlocal st
            st, m = step(st, b)
            return m["loss"]

        timeit("FULL train step (B=32)", full2, sharded, warmup=3, iters=10)

        # forward-only loss (no grad, no optimizer) for the fwd/bwd split
        import functools

        def fwd_only(state, b):
            rngs = {"dropout": jax.random.PRNGKey(1),
                    "vae": jax.random.PRNGKey(2)}
            out, _ = module.policy.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                b, train=True, rngs=rngs, mutable=["batch_stats"],
            )
            return out["loss"]

        timeit("forward-only loss (B=32)", jax.jit(fwd_only), st, sharded)


if __name__ == "__main__":
    main()

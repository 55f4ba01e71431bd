"""Round-2 component profile of the flagship ACT+pcd train step (bf16).

Times each piece exactly as the jitted train step runs it (bf16 params+batch,
fwd+bwd where gradients flow). Run on the real chip:

    python scripts/profile_step2.py [full|parts]
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


def timeit(name, fn, *args, warmup=2, iters=10):
    try:
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
        print(f"{name:52s} {dt:8.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
        return float("inf")


def cast(tree, dtype=jnp.bfloat16):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)

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

        def full(state, b):
            s, m = step(state, b)
            return m["loss"]

        # non-donated timing copy: reuse state functionally
        st = state
        def full2(b):
            nonlocal st
            st, m = step(st, b)
            return m["loss"]
        timeit("FULL train step (B=32)", full2, sharded, warmup=3, iters=10)

    if which in ("all", "parts"):
        from pointcloudmatters_tpu.ops.pointops import (
            farthest_point_sampling_padded,
            gather_rows_padded,
            knn_query_padded,
        )

        coord = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 0.4 - 0.2,
                            jnp.bfloat16)
        valid = jnp.ones((B, N), bool)

        fps = jax.jit(lambda c, v: farthest_point_sampling_padded(c, v, M))
        timeit("fps pallas", fps, coord, valid)
        idx = fps(coord, valid)
        new_xyz = jnp.take_along_axis(coord, idx[..., None], axis=1)
        knn = jax.jit(lambda q, c, v: knn_query_padded(q, c, v, K)[0])
        timeit("knn pallas", knn, new_xyz, coord, valid)
        nn_idx = knn(new_xyz, coord, valid)

        # token builder (current pcd_sampling math) fwd+bwd in bf16
        g = jnp.asarray(rng.randn(B, N, D).astype(np.float32), jnp.bfloat16)
        h = jnp.asarray(rng.randn(B, M, D).astype(np.float32), jnp.bfloat16)

        def token_loss(g, h):
            gg = gather_rows_padded(g, nn_idx)
            x = jnp.where((nn_idx < 0)[..., None], 0.0, gg - h[:, :, None, :])
            count = float(B * M * K)
            total = jnp.sum(x, axis=(0, 1, 2), dtype=jnp.float32)
            total_sq = jnp.sum(x * x, axis=(0, 1, 2), dtype=jnp.float32)
            mean = total / count
            var = jnp.maximum(total_sq / count - mean * mean, 0.0)
            es = jax.lax.rsqrt(var + 1e-5)
            y = jax.nn.relu(x * es.astype(x.dtype) - (mean * es).astype(x.dtype))
            return jnp.sum(jnp.max(y, axis=2).astype(jnp.float32) ** 2)

        tg = jax.jit(jax.grad(token_loss, argnums=(0, 1)))
        timeit("token gather+bn+max fwd+bwd", tg, g, h)

        # gather fwd only / gather+max fwd+bwd (isolate the scatter cost)
        gonly = jax.jit(lambda g: gather_rows_padded(g, nn_idx))
        timeit("gather fwd only", gonly, g)
        gmax = jax.jit(jax.grad(
            lambda g: jnp.sum(jnp.max(gather_rows_padded(g, nn_idx), axis=2)
                              .astype(jnp.float32) ** 2)))
        timeit("gather+max fwd+bwd", gmax, g)

        # PointNet fwd+bwd bf16
        from pointcloudmatters_tpu.models.components.pcd_encoder.pointnet import (
            PointNet,
        )

        feat6 = jnp.asarray(rng.rand(B, N, 6).astype(np.float32), jnp.bfloat16)
        pn = PointNet(in_channels=6)
        pcd = {"feat": feat6, "valid": valid}
        pvars = pn.init(jax.random.PRNGKey(0), pcd, train=True)
        pparams = cast(pvars["params"])

        def pn_loss(params, pcd):
            out, _ = pn.apply(
                {"params": params, "batch_stats": pvars["batch_stats"]},
                pcd, train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)

        timeit("pointnet fwd+bwd", jax.jit(jax.grad(pn_loss)), pparams, pcd)

        # transformer enc+dec fwd+bwd bf16 at flagship shapes
        from pointcloudmatters_tpu.models.components.act.transformer import (
            Transformer,
        )

        for impl in ("oneshot", "dense"):
            tr = Transformer(d_model=D, nhead=8, num_encoder_layers=4,
                             num_decoder_layers=7, dim_feedforward=32,
                             dropout=0.1, normalize_before=False,
                             return_intermediate_dec=True,
                             attention_impl=impl)
            src = jnp.asarray(rng.randn(B, M, D).astype(np.float32), jnp.bfloat16)
            qe = jnp.asarray(rng.randn(100, D).astype(np.float32), jnp.bfloat16)
            pos = jnp.asarray(rng.randn(1, M, D).astype(np.float32), jnp.bfloat16)
            lat = jnp.asarray(rng.randn(B, D).astype(np.float32), jnp.bfloat16)
            prop = jnp.asarray(rng.randn(B, 2, D).astype(np.float32), jnp.bfloat16)
            ape = jnp.asarray(rng.randn(3, D).astype(np.float32), jnp.bfloat16)
            tvars = tr.init(
                {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                src, qe, pos=pos, latent_input=lat, proprio_input=prop,
                additional_pos_embed=ape, deterministic=True)
            tparams = cast(tvars["params"])

            def tr_loss(params, src):
                hs = tr.apply({"params": params}, src, qe, pos=pos,
                              latent_input=lat, proprio_input=prop,
                              additional_pos_embed=ape, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(2)})
                return jnp.sum(hs[0].astype(jnp.float32) ** 2)

            timeit(f"transformer[{impl}] enc4+dec1 fwd+bwd L=2051",
                   jax.jit(jax.grad(tr_loss)), tparams, src)


if __name__ == "__main__":
    main()

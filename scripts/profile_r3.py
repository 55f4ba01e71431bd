"""Round-3 profile: the landed fused token builder + chunk-skip kNN in situ.

Times (a) GroupedBNReluMax fwd+bwd at flagship shapes, (b) the kNN kernels
with a Morton-sorted cloud (as the collate now produces), (c) the full train
step.  Run on the real chip: python scripts/profile_r3.py [full|parts]
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


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()}  PCM_KNN_IMPL={os.environ.get('PCM_KNN_IMPL', '<default>')}",
          flush=True)
    rng = np.random.RandomState(0)

    if which in ("all", "parts"):
        from pointcloudmatters_tpu.data.collate import morton_order
        from pointcloudmatters_tpu.ops.pointops import (
            farthest_point_sampling_padded,
            knn_query_padded,
        )

        coord_np = rng.rand(B, N, 3).astype(np.float32) * 0.4 - 0.2
        # Morton-sort host-side, as the collate does
        for b in range(B):
            coord_np[b] = coord_np[b][morton_order(coord_np[b])]
        coord = jnp.asarray(coord_np, jnp.bfloat16)
        valid = jnp.ones((B, N), bool)

        fps = jax.jit(lambda c, v: farthest_point_sampling_padded(c, v, M))
        idx = fps(coord, valid)
        new_xyz = jnp.take_along_axis(coord, idx[..., None], axis=1)
        knn = jax.jit(lambda q, c, v: knn_query_padded(q, c, v, K)[0])
        timeit("knn (morton-sorted cloud, active impl)", knn, new_xyz, coord, valid)
        nn_idx = knn(new_xyz, coord, valid)

        # fused token builder fwd+bwd at flagship shapes
        from pointcloudmatters_tpu.models.components.nn_utils import (
            GroupedBNReluMax,
        )

        g = jnp.asarray(rng.randn(B, N, D).astype(np.float32), jnp.bfloat16)
        h = jnp.asarray(rng.randn(B, M, D).astype(np.float32), jnp.bfloat16)
        mod = GroupedBNReluMax()
        variables = mod.init(jax.random.PRNGKey(0), g, h, nn_idx,
                             use_running_average=False)

        def loss(g, h):
            y, _ = mod.apply(variables, g, h, nn_idx,
                             use_running_average=False,
                             mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2)

        timeit("GroupedBNReluMax fwd+bwd", jax.jit(jax.grad(loss, argnums=(0, 1))), g, h)

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


if __name__ == "__main__":
    main()

"""Upper-bound the encoder mega-kernel prize (VERDICT r4 item 2).

Times the full flagship train step with LayerNorm and/or BitsDropout
replaced by identity (NOT semantically valid — a pure headroom probe):
whatever a prologue/epilogue-fused attention kernel could save by
absorbing those passes is bounded by the delta measured here.
Run: python -u scripts/ablate_ln_dropout.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build_step():
    from __graft_entry__ import build_batch, build_flagship
    from pointcloudmatters_tpu.models.bc_module import BCModule
    from pointcloudmatters_tpu.trainer import Trainer

    policy = build_flagship()
    module = BCModule(
        policy=policy,
        optimizer={"type": "AdamW", "lr": 5e-5, "weight_decay": 0.05},
        lr_scheduler={"scheduler": {"type": "OneCycleLR", "max_lr": 5e-5,
                                    "pct_start": 0.1}},
    )
    trainer = Trainer(default_root_dir="/tmp/pcm_ablate", max_epochs=1,
                     precision="bf16-mixed", devices="auto")
    batch = build_batch(batch_size=32, n_points=10240)
    module.setup_module(
        type("K", (), {"estimated_stepping_batches": 10_000,
                       "gradient_clip_val": None,
                       "accumulate_grad_batches": 1, "seed": 0})(),
        batch,
    )
    state = trainer._replicate(module.initial_state(batch))
    sharded = trainer.shard_batch(batch)
    return trainer._build_train_step(module), state, sharded


def timeit(name, step, state, sharded, iters=20):
    for _ in range(5):
        state, metrics = step(state, sharded)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, sharded)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:34s} {dt:8.2f} ms/step  {32 / dt * 1000:7.2f} sps",
          flush=True)
    return dt


def main():
    import flax.linen as nn
    from pointcloudmatters_tpu.models.components import nn_utils

    step, state, sharded = build_step()
    base = timeit("baseline", step, state, sharded)

    orig_ln = nn.LayerNorm.__call__
    orig_do = nn_utils.BitsDropout.__call__

    nn.LayerNorm.__call__ = lambda self, x: x
    step2, state2, sharded2 = build_step()
    no_ln = timeit("LayerNorm -> identity", step2, state2, sharded2)
    nn.LayerNorm.__call__ = orig_ln

    nn_utils.BitsDropout.__call__ = (
        lambda self, x, deterministic=None: x
    )
    step3, state3, sharded3 = build_step()
    no_do = timeit("BitsDropout -> identity", step3, state3, sharded3)

    nn.LayerNorm.__call__ = lambda self, x: x
    step4, state4, sharded4 = build_step()
    no_both = timeit("both -> identity", step4, state4, sharded4)
    nn.LayerNorm.__call__ = orig_ln
    nn_utils.BitsDropout.__call__ = orig_do

    print(f"headroom: LN {base - no_ln:+.2f} ms, dropout "
          f"{base - no_do:+.2f} ms, both {base - no_both:+.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()

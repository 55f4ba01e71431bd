"""Data-parallel sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from __graft_entry__ import build_batch, build_flagship
from pointcloudmatters_tpu.models.bc_module import BCModule
from pointcloudmatters_tpu.trainer import Trainer


def _module():
    policy = build_flagship(hidden_dim=32, npoints=16, nsample=4, chunk=6,
                            enc_layers=1, dec_layers=1, ffn=16)
    return BCModule(
        policy=policy,
        optimizer={"type": "AdamW", "lr": 1e-3, "weight_decay": 0.0},
    )


def _run_steps(n_devices, batch, n_steps=3, precision="32-true"):
    module = _module()
    trainer = Trainer(default_root_dir="/tmp/pcm_shard_test", max_epochs=1,
                      devices=n_devices, precision=precision)
    module.setup_module(
        type("K", (), {"estimated_stepping_batches": 100,
                       "gradient_clip_val": None,
                       "accumulate_grad_batches": 1, "seed": 0})(), batch
    )
    state = trainer._replicate(module.initial_state(batch))
    step = trainer._build_train_step(module)
    sharded = trainer.shard_batch(batch)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, sharded)
        losses.append(float(metrics["loss"]))
    return trainer, sharded, losses


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestDataParallel:
    def test_batch_sharded_across_mesh(self):
        batch = build_batch(batch_size=8, n_points=64, chunk=6)
        trainer, sharded, losses = _run_steps(8, batch)
        assert trainer.mesh.devices.size == 8
        assert sharded["qpos"].sharding == NamedSharding(
            trainer.mesh, P("data", None)
        )
        assert all(np.isfinite(losses)), losses

    def test_1dev_vs_8dev_same_loss(self):
        """GSPMD semantics are global: the 8-way sharded step must compute
        the same loss (incl. cross-replica batch-norm stats) as 1 device."""
        batch = build_batch(batch_size=8, n_points=64, chunk=6)
        _, _, loss1 = _run_steps(1, batch)
        _, _, loss8 = _run_steps(8, batch)
        np.testing.assert_allclose(loss1, loss8, rtol=2e-4)

    def test_indivisible_batch_replicates(self):
        batch = build_batch(batch_size=6, n_points=64, chunk=6)  # 6 % 8 != 0
        trainer, sharded, losses = _run_steps(8, batch)
        assert sharded["qpos"].sharding == NamedSharding(trainer.mesh, P())
        assert all(np.isfinite(losses))

"""Training-stack tests: schedulers, optimizer groups, metrics, TemporalAgg,
trainer fit/checkpoint, and fake-env rollout validation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudmatters_tpu.utils.metrics import Metrics
from pointcloudmatters_tpu.utils.misc import TemporalAgg
from pointcloudmatters_tpu.utils.optimizer import build_optimizer
from pointcloudmatters_tpu.utils.scheduler import build_scheduler


class TestSchedulers:
    def test_one_cycle_shape(self):
        sch = build_scheduler(
            {"type": "OneCycleLR", "max_lr": 1e-3, "pct_start": 0.1,
             "anneal_strategy": "cos", "div_factor": 100.0,
             "final_div_factor": 1000.0},
            total_steps=1000, base_lr=1e-3,
        )
        vals = [float(sch(i)) for i in (0, 100, 999)]
        assert all(np.isfinite(vals))
        np.testing.assert_allclose(vals[0], 1e-3 / 100.0, rtol=1e-4)
        np.testing.assert_allclose(vals[1], 1e-3, rtol=1e-3)  # peak at pct_start
        assert vals[2] < vals[0]  # final = initial / final_div

    def test_one_cycle_degenerate_total_steps(self):
        """1-step debug runs must not produce NaN lrs."""
        sch = build_scheduler(
            {"type": "OneCycleLR", "max_lr": 1e-3, "pct_start": 0.1},
            total_steps=1, base_lr=1e-3,
        )
        assert np.isfinite(float(sch(0))) and np.isfinite(float(sch(1)))

    def test_multi_step(self):
        sch = build_scheduler(
            {"type": "MultiStepLR", "milestones": [0.5, 0.75], "gamma": 0.1},
            total_steps=100, base_lr=1.0,
        )
        np.testing.assert_allclose(float(sch(10)), 1.0)
        np.testing.assert_allclose(float(sch(60)), 0.1, rtol=1e-5)
        np.testing.assert_allclose(float(sch(80)), 0.01, rtol=1e-5)

    def test_poly_exp_cosine(self):
        poly = build_scheduler({"type": "PolyLR", "power": 0.9}, 100, 2.0)
        np.testing.assert_allclose(float(poly(0)), 2.0, rtol=1e-6)
        exp = build_scheduler({"type": "ExpLR", "gamma": 0.5}, 100, 2.0)
        np.testing.assert_allclose(float(exp(100)), 1.0, rtol=1e-5)
        cos = build_scheduler({"type": "CosineAnnealingLR"}, 100, 2.0)
        np.testing.assert_allclose(float(cos(0)), 2.0, rtol=1e-6)
        np.testing.assert_allclose(float(cos(100)), 0.0, atol=1e-6)

    def test_warmup(self):
        sch = build_scheduler(
            {"type": "MultiStepWithWarmupLR", "milestones": [0.8],
             "warmup_rate": 0.1}, total_steps=100, base_lr=1.0,
        )
        assert float(sch(0)) < 1e-5  # warmup_scale start
        np.testing.assert_allclose(float(sch(50)), 1.0, rtol=1e-5)


class TestOptimizer:
    def test_param_dicts_routing(self):
        params = {
            "backbone": {"kernel": jnp.ones((4, 4))},
            "head": {"kernel": jnp.ones((4, 4))},
        }
        tx = build_optimizer(
            {"type": "SGD", "lr": 1.0},
            params=params,
            param_dicts=[{"keyword": "backbone", "lr": 0.1}],
        )
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        np.testing.assert_allclose(np.asarray(updates["head"]["kernel"]), -1.0)
        np.testing.assert_allclose(
            np.asarray(updates["backbone"]["kernel"]), -0.1, rtol=1e-6
        )

    def test_adamw_matches_torch_semantics(self):
        import torch

        params = {"w": jnp.asarray([[1.0, -2.0], [0.5, 3.0]])}
        grads = {"w": jnp.asarray([[0.1, 0.2], [-0.3, 0.4]])}
        tx = build_optimizer({"type": "AdamW", "lr": 1e-2, "weight_decay": 0.1})
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        new_w = np.asarray(params["w"] + updates["w"])

        tw = torch.tensor(np.asarray(params["w"]), requires_grad=True)
        opt = torch.optim.AdamW([tw], lr=1e-2, weight_decay=0.1)
        tw.grad = torch.tensor(np.asarray(grads["w"]))
        opt.step()
        np.testing.assert_allclose(new_w, tw.detach().numpy(), atol=1e-6)

    def test_onecycle_momentum_cycling_matches_torch(self):
        """OneCycleLR cycle_momentum=True: torch cycles Adam beta1
        0.95 <-> 0.85 inverse to the LR. Assert (a) our beta1 schedule
        tracks torch's installed betas exactly, and (b) the full AdamW
        parameter trajectory matches torch step-for-step over the cycle."""
        import torch

        from pointcloudmatters_tpu.utils.scheduler import (
            build_momentum_schedule,
        )

        T, lr, wd = 30, 1e-2, 0.1
        cfg = {"type": "OneCycleLR", "max_lr": lr, "pct_start": 0.3}

        w0 = np.asarray([[1.0, -2.0], [0.5, 3.0]], np.float32)
        g_base = np.asarray([[0.1, 0.2], [-0.3, 0.4]], np.float32)

        tw = torch.tensor(w0, requires_grad=True)
        opt = torch.optim.AdamW([tw], lr=lr, weight_decay=wd)
        sched = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=lr, total_steps=T, pct_start=0.3,
        )  # cycle_momentum defaults True
        torch_b1, torch_w = [], []
        for t in range(T):
            torch_b1.append(float(opt.param_groups[0]["betas"][0]))
            tw.grad = torch.tensor(g_base * (1.0 + 0.1 * t))
            opt.step()
            sched.step()
            torch_w.append(tw.detach().numpy().copy())

        schedule = build_scheduler(cfg, T, lr)
        b1_schedule = build_momentum_schedule(cfg, T)
        assert b1_schedule is not None
        ours_b1 = [float(b1_schedule(t)) for t in range(T)]
        np.testing.assert_allclose(ours_b1, torch_b1, atol=1e-6)
        # cycle shape: starts at max_momentum, dips to base at peak-lr step
        np.testing.assert_allclose(ours_b1[0], 0.95, atol=1e-6)
        assert min(ours_b1) < 0.852

        tx = build_optimizer(
            {"type": "AdamW", "lr": lr, "weight_decay": wd},
            lr_schedule=schedule, b1_schedule=b1_schedule,
        )
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        import optax

        for t in range(T):
            grads = {"w": jnp.asarray(g_base * (1.0 + 0.1 * t))}
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            np.testing.assert_allclose(
                np.asarray(params["w"]), torch_w[t], atol=2e-6,
                err_msg=f"step {t}",
            )

    def test_momentum_schedule_none_for_other_schedulers(self):
        from pointcloudmatters_tpu.utils.scheduler import (
            build_momentum_schedule,
        )

        assert build_momentum_schedule(
            {"type": "CosineAnnealingLR"}, 100) is None
        assert build_momentum_schedule(
            {"type": "OneCycleLR", "cycle_momentum": False}, 100) is None

    def test_adam_coupled_l2_matches_torch(self):
        import torch

        params = {"w": jnp.asarray([[1.0, -2.0]])}
        grads = {"w": jnp.asarray([[0.1, 0.2]])}
        tx = build_optimizer({"type": "Adam", "lr": 1e-2, "weight_decay": 0.1})
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        new_w = np.asarray(params["w"] + updates["w"])

        tw = torch.tensor(np.asarray(params["w"]), requires_grad=True)
        opt = torch.optim.Adam([tw], lr=1e-2, weight_decay=0.1)
        tw.grad = torch.tensor(np.asarray(grads["w"]))
        opt.step()
        np.testing.assert_allclose(new_w, tw.detach().numpy(), atol=1e-6)


class TestMetrics:
    def test_routing(self):
        m = Metrics(
            [{"type": "MeanMetric"}, {"type": "MaxMetric"}],
            ["loss", "acc"], ["train/loss", "train/acc_max"],
        )
        m.update({"loss": 2.0, "acc": 0.5})
        m.update({"loss": 4.0, "acc": 0.8})
        out = m.compute()
        assert out["train/loss"] == 3.0
        assert out["train/acc_max"] == 0.8
        m.reset()
        m.update({"loss": 10.0, "acc": 0.1})
        assert m.compute()["train/loss"] == 10.0


class TestTemporalAgg:
    def test_identity_when_off(self):
        agg = TemporalAgg(apply=False)
        chunk = np.arange(12).reshape(3, 4).astype(float) + 1
        np.testing.assert_array_equal(agg(chunk), chunk[0])

    def test_exponential_ensembling(self):
        agg = TemporalAgg(apply=True, action_dim=2, chunk_size=3, k=0.01)
        c1 = np.array([[1.0, 1], [2, 2], [3, 3]])
        out1 = agg(c1)
        np.testing.assert_allclose(out1, [1.0, 1.0])  # single chunk
        c2 = np.array([[10.0, 10], [20, 20], [30, 30]])
        out2 = agg(c2)
        # chunk age 1 predicts index 1 (value 2), age 0 predicts index 0 (10)
        w = np.exp(-np.arange(2) * 0.01)
        w = w / w.sum()
        np.testing.assert_allclose(out2, w[0] * 2 + w[1] * 10)


# ---------------------------------------------------------------------------
# End-to-end trainer on synthetic data
# ---------------------------------------------------------------------------

CAM_SIDE = 16  # 256 points/cam


def _make_data(tmp_path, n_episodes=4):
    from tests.synth import make_synthetic_maniskill2

    return make_synthetic_maniskill2(
        str(tmp_path / "traj.h5"), n_episodes=n_episodes, episode_len=6,
        cam_side=CAM_SIDE,
    )


def _compose(tmp_path, data_file, extra=()):
    from pointcloudmatters_tpu.utils import config as C

    cfg = C.compose(
        str(os.path.join(os.path.dirname(__file__), "..", "configs")), "train",
        [
            "exp_maniskill2_act_policy=base",
            "exp_maniskill2_act_policy/maniskill2_pcd_task@maniskill2_pcd_task=PickCube-v0",
            "exp_maniskill2_act_policy/maniskill2_model@maniskill2_model=scratch_pointnet_pcd",
            "debug=default",
            f"data.train.dataset_file={data_file}",
            f"data.train.point_num_per_cam={CAM_SIDE * CAM_SIDE}",
            "data.train.chunk_size=5",
            "data.train.cache_dir=" + str(tmp_path / "cache"),
            "data.batch_size_train=2",
            "data.pad_multiple=64",
            "model.policy.hidden_dim=32",
            "model.policy.pcd_npoints=16",
            "model.policy.pcd_nsample=4",
            "model.policy.transformer.num_encoder_layers=1",
            "model.policy.transformer.num_decoder_layers=1",
            "model.policy.transformer.nhead=4",
            "logger=csv",
            f"paths.log_dir={tmp_path}/logs",
            "trainer.log_every_n_steps=1",
            "callbacks.model_checkpoint.save_last=true",
            *extra,
        ],
    )
    from pointcloudmatters_tpu.utils.config import resolve_config, set_runtime

    set_runtime(output_dir=str(tmp_path / "out"), cwd=str(tmp_path))
    resolve_config(cfg)
    return cfg


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train 1 debug epoch end-to-end through the real entry path."""
    from pointcloudmatters_tpu.utils import config as C
    from pointcloudmatters_tpu.utils.utils import (
        instantiate_callbacks,
        instantiate_loggers,
    )

    tmp_path = tmp_path_factory.mktemp("e2e")
    data_file = _make_data(tmp_path)
    cfg = _compose(tmp_path, data_file)
    dm = C.instantiate(cfg.data)
    model = C.instantiate(cfg.model)
    callbacks = instantiate_callbacks(cfg.get("callbacks"))
    loggers = instantiate_loggers(cfg.get("logger"))
    trainer = C.instantiate(cfg.trainer, callbacks=callbacks, logger=loggers)
    trainer.fit(model, datamodule=dm)
    return cfg, dm, model, trainer, tmp_path


class TestTrainerFit:
    def test_loss_finite_and_logged(self, trained):
        cfg, dm, model, trainer, tmp_path = trained
        out = model.train_metrics.compute()
        assert np.isfinite(out["train/loss"])
        csvs = [
            os.path.join(root, f)
            for root, _, files in os.walk(str(tmp_path / "out"))
            for f in files if f == "metrics.csv"
        ]
        assert csvs, "csv logger wrote no metrics"

    def test_checkpoint_roundtrip(self, trained):
        cfg, dm, model, trainer, tmp_path = trained
        last = os.path.join(trainer.checkpoint_callback.dirpath, "last")
        assert os.path.isdir(last), "save_last checkpoint missing"
        before = jax.tree.leaves(trainer.state.params)[0].copy()
        # perturb, then restore
        trainer.state = trainer.state.replace(
            params=jax.tree.map(lambda p: p + 1.0, trainer.state.params)
        )
        trainer.restore_checkpoint(last)
        after = jax.tree.leaves(trainer.state.params)[0]
        np.testing.assert_allclose(np.asarray(after), np.asarray(before))

    def test_loss_decreases_multiepoch(self, tmp_path):
        from pointcloudmatters_tpu.utils import config as C

        data_file = _make_data(tmp_path)
        cfg = _compose(
            tmp_path, data_file,
            extra=[
                "trainer.max_epochs=6",
                "trainer.limit_train_batches=2",
                "trainer.detect_anomaly=true",
                "trainer.check_val_every_n_epoch=0",
                "model.optimizer.lr=0.001",
                "callbacks=none",
                "logger=null",
            ],
        )
        dm = C.instantiate(cfg.data)
        model = C.instantiate(cfg.model)
        trainer = C.instantiate(cfg.trainer, callbacks=[], logger=None)
        losses = []
        orig_update = model.train_metrics.update

        def record(outputs, weight=1.0):
            if "loss" in outputs:
                losses.append(float(outputs["loss"]))
            orig_update(outputs, weight)

        model.train_metrics.update = record
        trainer.fit(model, datamodule=dm)
        assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


class TestStochasticWeightAveraging:
    def test_swa_averages_and_swaps_weights(self, tmp_path):
        """SWA callback (reference
        configs/callbacks/stochastic_weight_averaging.yaml): composes from
        config, averages epoch-end weights from swa_epoch_start, swaps the
        average in at fit end with refreshed BN stats, and the model still
        evaluates finitely on the averaged weights."""
        from pointcloudmatters_tpu.utils import config as C
        from pointcloudmatters_tpu.utils.utils import instantiate_callbacks

        data_file = _make_data(tmp_path)
        cfg = _compose(
            tmp_path, data_file,
            extra=[
                "callbacks=stochastic_weight_averaging",
                "callbacks.stochastic_weight_averaging.swa_lrs=0.0005",
                "callbacks.stochastic_weight_averaging.swa_epoch_start=0.5",
                "callbacks.stochastic_weight_averaging.annealing_epochs=1",
                "trainer.max_epochs=4",
                "trainer.limit_train_batches=2",
                "trainer.check_val_every_n_epoch=0",
                "trainer.num_sanity_val_steps=0",
                "logger=null",
            ],
        )
        dm = C.instantiate(cfg.data)
        model = C.instantiate(cfg.model)
        callbacks = instantiate_callbacks(cfg.get("callbacks"))
        swa = next(
            cb for cb in callbacks
            if type(cb).__name__ == "StochasticWeightAveraging"
        )
        trainer = C.instantiate(cfg.trainer, callbacks=callbacks, logger=None)
        trainer.fit(model, datamodule=dm)

        # epochs 2 and 3 (start = 0.5 * 4) entered the average
        assert swa.n_averaged == 2
        # fit-end state carries the averaged parameters
        final = jax.tree.leaves(trainer.state.params)
        avg = jax.tree.leaves(swa._avg)
        for f, a in zip(final, avg):
            np.testing.assert_array_equal(np.asarray(f), np.asarray(a))
        assert all(np.all(np.isfinite(np.asarray(x))) for x in final)
        # refreshed BN stats are finite
        for leaf in jax.tree.leaves(trainer.state.batch_stats):
            assert np.all(np.isfinite(np.asarray(leaf)))
        # the SWALR wrap replaced the post-start LR: at the final step the lr
        # should sit at swa_lrs (annealing_epochs=1 completes before the end)
        lr_end = float(trainer._schedule(trainer.estimated_stepping_batches))
        np.testing.assert_allclose(lr_end, 0.0005, rtol=1e-5)
        # averaged weights still drive a finite eval forward pass
        batch = next(iter(dm.train_dataloader()))
        out = model.apply_eval(
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats},
            trainer.shard_batch(batch),
        )
        assert np.isfinite(float(out["loss"]))


class TestRolloutValidation:
    def test_fake_env_rollout(self, tmp_path):
        """Full rollout validation through a fake env implementing the
        gymnasium 5-tuple contract (SURVEY §4's test seam)."""
        from pointcloudmatters_tpu.utils import config as C

        rng = np.random.RandomState(0)
        n_pts = CAM_SIDE * CAM_SIDE

        class FakeEnv:
            def _obs(self):
                xyz = rng.rand(n_pts, 3).astype(np.float32) * 0.3
                w = (rng.rand(n_pts, 1) > 0.2).astype(np.float32)
                return {
                    "agent": {"qpos": rng.randn(9).astype(np.float32)},
                    "pointcloud": {
                        "xyzw": np.concatenate([xyz, w], -1),
                        "rgb": rng.randint(0, 255, (n_pts, 3)).astype(np.uint8),
                    },
                    "extra": {"goal_pos": rng.randn(3).astype(np.float32)},
                }

            def reset(self, seed=None, options=None):
                self.t = 0
                self.seeds = seed
                return self._obs(), {}

            def step(self, action):
                assert np.asarray(action).shape == (7,)
                self.t += 1
                done = self.t >= 3
                return self._obs(), 0.5, done, False, {"success": done}

            def close(self):
                pass

        data_file = _make_data(tmp_path)
        cfg = _compose(
            tmp_path, data_file,
            extra=[
                "trainer.check_val_every_n_epoch=1",
                "trainer.limit_val_batches=2",
                "data.val.size=2",
                "callbacks=none",
                "logger=null",
            ],
        )
        dm = C.instantiate(cfg.data)
        model = C.instantiate(cfg.model)
        model.env_factory = lambda module: FakeEnv()
        trainer = C.instantiate(cfg.trainer, callbacks=[], logger=None)
        trainer.fit(model, datamodule=dm)
        out = model.best_val_metrics.compute()
        assert out["val/mean_success"] == 1.0


class TestOptimizerV2:
    def test_layer_decay_scales(self):
        import jax

        from pointcloudmatters_tpu.utils.optimizer import (
            build_optimizer_v2,
            param_groups_layer_decay,
        )

        params = {
            "patch_embed": {"kernel": jnp.ones((3, 4))},
            "blocks_0": {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))},
            "blocks_1": {"w": jnp.ones((4, 4))},
            "head": {"w": jnp.ones((4, 2))},
        }
        scales, mask = param_groups_layer_decay(params, layer_decay=0.5,
                                                num_layers=4)
        # embedding layer 0, blocks 1/2, head = max layer -> scale 1
        assert scales["head"]["w"] == 1.0
        assert scales["blocks_1"]["w"] == 2 * scales["blocks_0"]["w"]
        assert scales["patch_embed"]["kernel"] == 0.5 ** 3
        # 1-D params excluded from decay
        assert mask["blocks_0"]["b"] is False
        assert mask["blocks_0"]["w"] is True

        tx = build_optimizer_v2(
            {"type": "AdamW", "lr": 1e-3, "weight_decay": 0.05,
             "layer_decay": 0.5}, params,
        )
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        # head update magnitude > patch_embed update magnitude (layer decay)
        assert abs(float(updates["head"]["w"][0, 0])) > abs(
            float(updates["patch_embed"]["kernel"][0, 0])
        )


class TestTimmCosine:
    def test_warmup_then_cosine(self):
        from pointcloudmatters_tpu.utils.scheduler import build_scheduler

        sch = build_scheduler(
            {"type": "CosineLRScheduler", "warmup_t": 10,
             "warmup_lr_init": 1e-6}, 100, 1e-3,
        )
        assert float(sch(0)) < 1e-4
        np.testing.assert_allclose(float(sch(10)), 1e-3, rtol=1e-3)
        assert float(sch(100)) < 1e-5

    def test_multi_cycle_decay(self):
        from pointcloudmatters_tpu.utils.scheduler import build_scheduler

        sch = build_scheduler(
            {"type": "CosineLRScheduler", "cycle_limit": 3,
             "cycle_decay": 0.5, "cycle_mul": 1.0, "t_initial": 40,
             "k_decay": 1.0 + 1e-9}, 120, 1e-3,
        )
        # cycle restarts at t=40 with halved peak
        np.testing.assert_allclose(float(sch(0)), 1e-3, rtol=1e-4)
        np.testing.assert_allclose(float(sch(40)), 5e-4, rtol=1e-3)


class TestTransformerForDiffusion:
    def test_shapes_and_conditioning(self):
        import jax

        from pointcloudmatters_tpu.models.components.diffusion_policy.diffusion.transformer_for_diffusion import (
            TransformerForDiffusion,
        )

        m = TransformerForDiffusion(
            input_dim=7, output_dim=7, horizon=8, n_obs_steps=2, cond_dim=10,
            n_layer=2, n_head=4, n_emb=32, n_cond_layers=1, causal_attn=True,
        )
        x = jnp.zeros((2, 8, 7))
        t = jnp.asarray([1, 3])
        cond = jnp.ones((2, 2, 10))
        v = m.init(jax.random.PRNGKey(0), x, t, cond=cond)
        out = m.apply(v, x, t, cond=cond)
        assert out.shape == (2, 8, 7)
        out2 = m.apply(v, x, t, cond=cond * 2)
        assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_validate_val_only_datamodule(tmp_path):
    """trainer.validate() must work without a train split (VERDICT r1 #9:
    the validate.py use case — load ckpt, eval)."""
    import jax.numpy as jnp

    from __graft_entry__ import build_batch, build_flagship
    from pointcloudmatters_tpu.data.loader import DataLoader
    from pointcloudmatters_tpu.models.bc_module import BCModule
    from pointcloudmatters_tpu.trainer import Trainer

    template = build_batch(batch_size=4, n_points=64, chunk=5)

    class ValOnlyDataset:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {
                "qpos": template["qpos"][i],
                "actions": template["actions"][i],
                "is_pad": template["is_pad"][i],
                "goal_cond": template["goal_cond"][i],
                "pcds": {k: v[i] for k, v in template["pcds"].items()},
            }

    class ValOnlyDM:
        def setup(self, stage):
            pass

        def train_dataloader(self):
            raise RuntimeError("no train split")

        def val_dataloader(self):
            return DataLoader(ValOnlyDataset(), batch_size=2)

    policy = build_flagship(hidden_dim=32, npoints=16, nsample=4, chunk=5,
                            enc_layers=1, dec_layers=1, ffn=16)
    module = BCModule(
        policy=policy,
        optimizer={"type": "AdamW", "lr": 1e-4},
        lr_scheduler={"scheduler": {"type": "OneCycleLR", "max_lr": 1e-4,
                                    "pct_start": 0.1}},
    )
    trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=1,
                      precision="32-true", devices=1)
    metrics = trainer.validate(module, ValOnlyDM())
    assert "val/loss" in metrics or metrics, metrics
    loss = metrics.get("val/loss")
    assert loss is None or jnp.isfinite(loss)


def test_async_rollouts_overlap_sim_and_policy():
    """SURVEY §7.4.5 / VERDICT r1 #6: with an env pool, rollout wall-clock
    approaches max(sim, policy) per step instead of their sum, and metrics
    are identical to the serial protocol."""
    import threading
    import time as _time

    import numpy as np

    from pointcloudmatters_tpu.envs.rollout import run_maniskill2_rollouts

    SIM_MS, POLICY_MS, STEPS, EPISODES = 0.004, 0.002, 6, 8

    class SlowFakeEnv:
        def reset(self, seed=None, options=None):
            self._seed, self._t = seed, 0
            return self._obs(), {}

        def _obs(self):
            return {"agent": {"qpos": np.zeros(4, np.float32)}}

        def step(self, action):
            _time.sleep(SIM_MS)  # host-bound simulator work
            self._t += 1
            done = self._t >= STEPS
            return self._obs(), 0.0, done, False, {
                "success": (self._seed % 2 == 0) if done else False
            }

    class Stats(dict):
        pass

    dataset = type("DS", (), {})()
    dataset.norm_stats = {
        "qpos_mean": np.zeros(4, np.float32),
        "qpos_std": np.ones(4, np.float32),
        "action_mean": np.zeros(4, np.float32),
        "action_std": np.ones(4, np.float32),
    }
    dataset.goal_cond_keys = None

    device_lock = threading.Lock()

    def predict(data):
        with device_lock:  # one device: applies serialize
            _time.sleep(POLICY_MS)
        return np.zeros((1, 5, 4), np.float32)

    kwargs = dict(
        predict=predict, dataset=dataset, env_id="PickCube-v0",
        n_episodes=EPISODES, action_dim=4, num_queries=5,
        temporal_agg=False, max_steps=STEPS,
    )
    t0 = _time.perf_counter()
    serial = run_maniskill2_rollouts(env=SlowFakeEnv(), **kwargs)
    t_serial = _time.perf_counter() - t0

    t0 = _time.perf_counter()
    overlapped = run_maniskill2_rollouts(
        env=None, env_factory=SlowFakeEnv, num_envs=4, **kwargs
    )
    t_async = _time.perf_counter() - t0

    assert overlapped == serial, (overlapped, serial)
    # 4 workers: ideal speedup bounded by the serialized policy; require a
    # comfortably-sub-serial wall clock
    assert t_async < 0.6 * t_serial, (t_async, t_serial)


class TestSanityValSteps:
    def test_sanity_validation_runs_before_training(self, tmp_path):
        """num_sanity_val_steps runs N val batches before epoch 0 (Lightning
        semantics); metrics are discarded and limit_val_batches restored."""
        from pointcloudmatters_tpu.utils import config as C
        from pointcloudmatters_tpu.utils.utils import (
            instantiate_callbacks,
            instantiate_loggers,
        )

        data_file = _make_data(tmp_path)
        cfg = _compose(
            tmp_path, data_file,
            extra=["trainer.num_sanity_val_steps=2",
                   "trainer.limit_val_batches=5",
                   "trainer.check_val_every_n_epoch=100"],
        )
        dm = C.instantiate(cfg.data)
        model = C.instantiate(cfg.model)
        trainer = C.instantiate(
            cfg.trainer,
            callbacks=instantiate_callbacks(cfg.get("callbacks")),
            logger=instantiate_loggers(cfg.get("logger")),
        )

        calls = []
        orig = model.run_validation

        def spy(tr, datamodule):
            calls.append((tr.global_step, tr.limit_val_batches))
            return orig(tr, datamodule)

        model.run_validation = spy
        saved_limit = trainer.limit_val_batches
        trainer.fit(model, datamodule=dm)
        # exactly one sanity pass, before any optimizer step, with the
        # sanity limit applied; the configured limit is restored afterwards
        assert len(calls) == 1
        step_at_call, limit_at_call = calls[0]
        assert step_at_call == 0
        assert limit_at_call == 2
        assert trainer.limit_val_batches == saved_limit

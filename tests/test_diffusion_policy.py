"""Diffusion-policy tests: DDPM math, UNet shapes, mask generator, obs
encoders, policy train/sample, and the DP training vertical end-to-end."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudmatters_tpu.models.components.diffusion_policy.diffusion.conditional_unet1d import (
    ConditionalUnet1D,
)
from pointcloudmatters_tpu.models.components.diffusion_policy.diffusion.ddpm import (
    DDPMScheduler,
)
from pointcloudmatters_tpu.models.components.diffusion_policy.diffusion.mask_generator import (
    LowdimMaskGenerator,
)
from pointcloudmatters_tpu.models.components.diffusion_policy.diffusion_unet_image_policy import (
    DiffusionUnetImagePolicy,
)
from pointcloudmatters_tpu.models.components.diffusion_policy.vision.multi_image_obs_encoder import (
    MultiImageObsEncoder,
    center_crop,
)
from pointcloudmatters_tpu.models.components.diffusion_policy.vision.pcd_obs_encoder import (
    PCDObsEncoder,
)
from pointcloudmatters_tpu.models.components.pcd_encoder.pointnet import PointNet


class TestDDPMScheduler:
    def test_cosine_betas(self):
        import math

        sch = DDPMScheduler(num_train_timesteps=100,
                            beta_schedule="squaredcos_cap_v2")
        abar = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        expected0 = min(1 - abar(1 / 100) / abar(0), 0.999)
        np.testing.assert_allclose(sch._table("betas")[0], expected0, rtol=1e-5)

    def test_add_noise_limits(self):
        sch = DDPMScheduler(num_train_timesteps=100, beta_schedule="linear")
        x0 = jnp.ones((2, 4, 3))
        noise = jnp.full((2, 4, 3), 5.0)
        near_clean = sch.add_noise(x0, noise, jnp.zeros((2,), jnp.int32))
        np.testing.assert_allclose(np.asarray(near_clean), 1.0, atol=0.35)
        near_noise = sch.add_noise(x0, noise, jnp.full((2,), 99, jnp.int32))
        assert float(jnp.mean(near_noise)) > 4.0  # mostly noise

    def test_step_matches_manual_posterior(self):
        """Compare one reverse step against the textbook DDPM posterior
        computed independently in numpy."""
        sch = DDPMScheduler(num_train_timesteps=10, beta_schedule="linear",
                            clip_sample=False)
        abar = np.asarray(sch.alphas_cumprod)
        t, t_prev = 5, 4
        rng = np.random.RandomState(0)
        sample = rng.randn(2, 3).astype(np.float32)
        eps_pred = rng.randn(2, 3).astype(np.float32)
        noise = rng.randn(2, 3).astype(np.float32)

        got = np.asarray(sch.step(
            jnp.asarray(eps_pred), jnp.asarray(t), jnp.asarray(t_prev),
            jnp.asarray(sample), jnp.asarray(noise),
        ))
        beta_t = 1 - abar[t] / abar[t_prev]
        alpha_t = 1 - beta_t
        x0 = (sample - np.sqrt(1 - abar[t]) * eps_pred) / np.sqrt(abar[t])
        mean = (np.sqrt(abar[t_prev]) * beta_t / (1 - abar[t])) * x0 \
            + (np.sqrt(alpha_t) * (1 - abar[t_prev]) / (1 - abar[t])) * sample
        var = beta_t * (1 - abar[t_prev]) / (1 - abar[t])
        np.testing.assert_allclose(got, mean + np.sqrt(var) * noise, rtol=1e-4)

    def test_terminal_step_is_deterministic(self):
        sch = DDPMScheduler(num_train_timesteps=10, clip_sample=False)
        sample = jnp.ones((2, 3))
        out1 = sch.step(jnp.zeros((2, 3)), jnp.asarray(0), jnp.asarray(-1),
                        sample, jnp.full((2, 3), 100.0))
        out2 = sch.step(jnp.zeros((2, 3)), jnp.asarray(0), jnp.asarray(-1),
                        sample, jnp.zeros((2, 3)))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))

    def test_inference_timesteps(self):
        sch = DDPMScheduler(num_train_timesteps=100)
        ts = sch.inference_timesteps(100)
        assert ts[0] == 99 and ts[-1] == 0 and len(ts) == 100
        ts10 = sch.inference_timesteps(10)
        assert len(ts10) == 10 and ts10[0] == 90


class TestConditionalUnet1D:
    def _build(self, horizon, input_dim=7):
        unet = ConditionalUnet1D(
            input_dim=input_dim, global_cond_dim=12,
            diffusion_step_embed_dim=16, down_dims=(16, 32), kernel_size=5,
            n_groups=8, cond_predict_scale=True,
        )
        x = jnp.zeros((2, horizon, input_dim))
        t = jnp.zeros((2,), jnp.int32)
        g = jnp.zeros((2, 12))
        variables = unet.init(jax.random.PRNGKey(0), x, t, global_cond=g)
        return unet, variables

    @pytest.mark.parametrize("horizon", [8, 16, 100])
    def test_shape_preserved(self, horizon):
        unet, variables = self._build(horizon)
        x = jnp.asarray(np.random.RandomState(0).randn(2, horizon, 7), jnp.float32)
        out = unet.apply(variables, x, jnp.asarray([3, 7]),
                         global_cond=jnp.ones((2, 12)))
        assert out.shape == (2, horizon, 7)

    def test_conditioning_matters(self):
        unet, variables = self._build(8)
        x = jnp.ones((2, 8, 7))
        t = jnp.asarray([1, 1])
        out_a = unet.apply(variables, x, t, global_cond=jnp.zeros((2, 12)))
        out_b = unet.apply(variables, x, t, global_cond=jnp.ones((2, 12)))
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
        out_t = unet.apply(variables, x, jnp.asarray([9, 9]),
                           global_cond=jnp.zeros((2, 12)))
        assert not np.allclose(np.asarray(out_a), np.asarray(out_t))


class TestMaskGenerator:
    def test_lowdim_obs_mask(self):
        gen = LowdimMaskGenerator(action_dim=2, obs_dim=3, max_n_obs_steps=2)
        mask = np.asarray(gen((2, 5, 5)))
        # obs dims (last 3) visible for first 2 steps only
        assert mask[:, :2, 2:].all()
        assert not mask[:, 2:, :].any()
        assert not mask[:, :, :2].any()

    def test_global_cond_mode_all_false(self):
        gen = LowdimMaskGenerator(action_dim=7, obs_dim=0, max_n_obs_steps=2)
        mask = np.asarray(gen((2, 16, 7)))
        assert not mask.any()


def _shape_meta_pcd(adim=7, qdim=9, gdim=3):
    return {
        "action": {"shape": [adim]},
        "obs": {
            "pcds": {"shape": [6], "type": "pcd"},
            "qpos": {"shape": [qdim], "type": "low_dim"},
        },
        "goal": {"task_emb": {"shape": [gdim]}} if gdim else None,
    }


def _tiny_dp_policy(shape_meta, horizon=8, n_steps=5):
    enc = PCDObsEncoder(
        shape_meta=shape_meta,
        pcd_model=PointNet(in_channels=6, num_classes=32),
        n_obs_step=2, pcd_nsample=4, pcd_npoints=16,
        pcd_hidden_dim=32, projector_layers=1, projector_channels=[32, 48, 48],
    )
    return DiffusionUnetImagePolicy(
        shape_meta=shape_meta,
        noise_scheduler=DDPMScheduler(num_train_timesteps=n_steps,
                                      beta_schedule="squaredcos_cap_v2"),
        obs_encoder=enc, horizon=horizon, n_action_steps=4, n_obs_steps=2,
        num_inference_steps=n_steps, diffusion_step_embed_dim=16,
        down_dims=(32, 64), kernel_size=5, n_groups=8, cond_predict_scale=True,
    )


def _dp_batch(B=2, To=2, N=64, horizon=8, adim=7, qdim=9, gdim=3, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "obs": {
            "qpos": jnp.asarray(rng.randn(B, horizon, qdim), jnp.float32),
            "pcds": {
                "coord": jnp.asarray(rng.randn(B * To, N, 3), jnp.float32),
                "feat": jnp.asarray(rng.randn(B * To, N, 6), jnp.float32),
                "valid": jnp.asarray(
                    np.arange(N)[None] < np.array([N - 8, N, N - 3, N])[: B * To, None]
                ),
            },
        },
        "action": jnp.asarray(rng.randn(B, horizon, adim), jnp.float32),
        "goal": {"task_emb": jnp.asarray(rng.randn(B, gdim), jnp.float32)},
    }


class TestDiffusionPolicy:
    @pytest.fixture(scope="class")
    def setup(self):
        meta = _shape_meta_pcd()
        policy = _tiny_dp_policy(meta)
        batch = _dp_batch()
        key = jax.random.PRNGKey(0)
        variables = policy.init(
            {"params": key, "noise": key, "sample": key}, batch, train=True
        )
        return policy, batch, variables

    def test_train_loss(self, setup):
        policy, batch, variables = setup
        out, _ = policy.apply(
            variables, batch, train=True,
            rngs={"noise": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
        )
        assert np.isfinite(float(out["loss"]))

    def test_sampling_shapes_and_determinism(self, setup):
        policy, batch, variables = setup
        ev = {k: v for k, v in batch.items() if k != "action"}
        key = jax.random.PRNGKey(7)
        p1 = policy.apply(variables, ev, train=False, rngs={"sample": key})
        p2 = policy.apply(variables, ev, train=False, rngs={"sample": key})
        assert p1["action"].shape == (2, 4, 7)
        assert p1["action_pred"].shape == (2, 8, 7)
        np.testing.assert_array_equal(np.asarray(p1["action"]),
                                      np.asarray(p2["action"]))
        p3 = policy.apply(variables, ev, train=False,
                          rngs={"sample": jax.random.PRNGKey(8)})
        assert not np.array_equal(np.asarray(p1["action"]), np.asarray(p3["action"]))

    def test_normalizer_bakes_into_output_range(self):
        """With clip_sample=True the normalized trajectory lies in [-1,1], so
        unnormalized actions must lie within the fitted data range."""
        from pointcloudmatters_tpu.utils.normalizer import LinearNormalizer

        meta = _shape_meta_pcd()
        normalizer = LinearNormalizer()
        rng = np.random.RandomState(0)
        actions = rng.uniform(5.0, 9.0, (100, 7)).astype(np.float32)
        normalizer.fit({"action": actions, "qpos": rng.randn(100, 9)})
        policy = _tiny_dp_policy(meta).clone(normalizer=normalizer)
        batch = _dp_batch()
        key = jax.random.PRNGKey(0)
        variables = policy.init(
            {"params": key, "noise": key, "sample": key}, batch, train=True
        )
        ev = {k: v for k, v in batch.items() if k != "action"}
        pred = policy.apply(variables, ev, train=False, rngs={"sample": key})
        a = np.asarray(pred["action"])
        assert a.min() >= 5.0 - 1e-3 and a.max() <= 9.0 + 1e-3


class TestPCDObsEncoder:
    def test_output_width_and_padding_invariance(self):
        meta = _shape_meta_pcd()
        enc = PCDObsEncoder(
            shape_meta=meta, pcd_model=PointNet(in_channels=6, num_classes=32),
            n_obs_step=2, pcd_nsample=4, pcd_npoints=16,
            pcd_hidden_dim=32, projector_layers=1,
            projector_channels=[32, 48, 48],
        )
        rng = np.random.RandomState(0)
        N = 48
        valid = np.arange(N)[None] < np.array([[30], [N]])
        obs = {
            "pcds": {
                "coord": jnp.asarray(rng.randn(2, N, 3), jnp.float32),
                "feat": jnp.asarray(rng.randn(2, N, 6), jnp.float32),
                "valid": jnp.asarray(valid),
            },
            "qpos": jnp.asarray(rng.randn(2, 9), jnp.float32),
        }
        variables = enc.init(jax.random.PRNGKey(0), obs, train=True)
        out = enc.apply(variables, obs, train=False)
        assert out.shape == (2, 48 + 9)  # projector_channels[-1] + qpos

        pcds = dict(obs["pcds"])
        feat = np.asarray(pcds["feat"]).copy()
        feat[~valid] = 123.0
        obs2 = dict(obs, pcds=dict(pcds, feat=jnp.asarray(feat)))
        out2 = enc.apply(variables, obs2, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


class TestMultiImageObsEncoder:
    def test_shared_model_with_depth(self):
        from pointcloudmatters_tpu.models.components.img_encoder.resnet import (
            ResNetTorchVision,
        )

        meta = {
            "obs": {
                "base_camera_rgb": {"shape": [32, 32, 3], "type": "rgb"},
                "base_camera_depth": {"shape": [32, 32, 1], "type": "depth"},
                "qpos": {"shape": [9], "type": "low_dim"},
            }
        }
        enc = MultiImageObsEncoder(
            shape_meta=meta,
            rgb_model=ResNetTorchVision(resnet_model="resnet18", channels=4,
                                        avg_pool=True, resize_to=32),
            resize_shape=None, crop_shape=(24, 24), random_crop=False,
            share_rgb_model=True, use_depth=True,
        )
        rng = np.random.RandomState(0)
        obs = {
            "base_camera_rgb": jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32),
            "base_camera_depth": jnp.asarray(rng.rand(2, 32, 32, 1), jnp.float32),
            "qpos": jnp.asarray(rng.randn(2, 9), jnp.float32),
        }
        variables = enc.init(jax.random.PRNGKey(0), obs, train=True)
        out = enc.apply(variables, obs, train=False)
        assert out.shape == (2, 512 + 9)

    def test_center_crop(self):
        x = jnp.arange(36, dtype=jnp.float32).reshape(1, 6, 6, 1)
        c = center_crop(x, 2, 2)
        np.testing.assert_array_equal(
            np.asarray(c)[0, :, :, 0], [[14, 15], [20, 21]]
        )


class TestDPTrainingVertical:
    def test_dp_train_via_cli_compose(self, tmp_path):
        """Compose the DP pcd experiment, train one debug epoch on synthetic
        data, check finite loss and normalizer wiring."""
        from tests.synth import make_synthetic_maniskill2

        from pointcloudmatters_tpu.utils import config as C
        from pointcloudmatters_tpu.utils.config import resolve_config, set_runtime

        data_file = make_synthetic_maniskill2(
            str(tmp_path / "traj.h5"), n_episodes=4, episode_len=6, cam_side=16
        )
        cfg = C.compose(
            os.path.join(os.path.dirname(__file__), "..", "configs"), "train",
            [
                "exp_maniskill2_diffusion_policy=base",
                "exp_maniskill2_diffusion_policy/maniskill2_pcd_task@maniskill2_pcd_task=PickCube-v0",
                "exp_maniskill2_diffusion_policy/maniskill2_model@maniskill2_model=scratch_pointnet_pcd",
                "debug=default",
                f"data.train.dataset_file={data_file}",
                "data.train.point_num_per_cam=256",
                "data.train.chunk_size=8",
                f"data.train.cache_dir={tmp_path}/cache",
                "data.batch_size_train=2",
                "data.pad_multiple=64",
                "model.policy.shape_meta.action.shape=[7]",
                "model.policy.shape_meta.obs.qpos.shape=[9]",
                "model.policy.num_inference_steps=5",
                "model.policy.noise_scheduler.num_train_timesteps=5",
                "model.policy.diffusion_step_embed_dim=16",
                "model.policy.down_dims=[16,32]",
                "model.policy.n_action_steps=4",
                "model.policy.obs_encoder.pcd_npoints=16",
                "model.policy.obs_encoder.pcd_nsample=4",
                "model.policy.obs_encoder.pcd_hidden_dim=16",
                "model.policy.obs_encoder.projector_channels=[16,32,32]",
                "model.policy.obs_encoder.pcd_model.num_classes=16",
                "callbacks=none",
                "logger=null",
                f"paths.log_dir={tmp_path}/logs",
            ],
        )
        set_runtime(output_dir=str(tmp_path / "out"), cwd=str(tmp_path))
        resolve_config(cfg)
        dm = C.instantiate(cfg.data)
        model = C.instantiate(cfg.model)
        trainer = C.instantiate(cfg.trainer, callbacks=[], logger=None)
        trainer.fit(model, datamodule=dm)
        out = model.train_metrics.compute()
        assert np.isfinite(out["train/loss"])
        # normalizer got wired from the dataset
        assert model.policy.normalizer is not None
        assert "action" in model.policy.normalizer


class TestDPRolloutValidation:
    def test_fake_env_dp_rollout(self, tmp_path):
        """DP rollout loop: n_action_steps actions executed per prediction,
        obs history of n_obs_steps frames (fake-env seam)."""
        from tests.synth import make_synthetic_maniskill2

        from pointcloudmatters_tpu.utils import config as C
        from pointcloudmatters_tpu.utils.config import resolve_config, set_runtime

        rng = np.random.RandomState(0)
        n_pts = 256

        class FakeEnv:
            def __init__(self):
                self.step_count = 0

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
                self.step_count = 0
                return self._obs(), {}

            def step(self, action):
                assert np.asarray(action).shape == (7,)
                self.step_count += 1
                done = self.step_count >= 6
                return self._obs(), 0.5, done, False, {"success": done}

            def close(self):
                pass

        data_file = make_synthetic_maniskill2(
            str(tmp_path / "traj.h5"), n_episodes=4, episode_len=6, cam_side=16
        )
        cfg = C.compose(
            os.path.join(os.path.dirname(__file__), "..", "configs"), "train",
            [
                "exp_maniskill2_diffusion_policy=base",
                "exp_maniskill2_diffusion_policy/maniskill2_pcd_task@maniskill2_pcd_task=PickCube-v0",
                "exp_maniskill2_diffusion_policy/maniskill2_model@maniskill2_model=scratch_pointnet_pcd",
                "debug=default",
                f"data.train.dataset_file={data_file}",
                "data.train.point_num_per_cam=256",
                "data.train.chunk_size=8",
                f"data.train.cache_dir={tmp_path}/cache",
                "data.batch_size_train=2",
                "data.pad_multiple=64",
                "data.val.size=2",
                "model.policy.shape_meta.action.shape=[7]",
                "model.policy.shape_meta.obs.qpos.shape=[9]",
                "model.policy.num_inference_steps=5",
                "model.policy.noise_scheduler.num_train_timesteps=5",
                "model.policy.diffusion_step_embed_dim=16",
                "model.policy.down_dims=[16,32]",
                "model.policy.n_action_steps=4",
                "model.policy.obs_encoder.pcd_npoints=16",
                "model.policy.obs_encoder.pcd_nsample=4",
                "model.policy.obs_encoder.pcd_hidden_dim=16",
                "model.policy.obs_encoder.projector_channels=[16,32,32]",
                "model.policy.obs_encoder.pcd_model.num_classes=16",
                "trainer.check_val_every_n_epoch=1",
                "trainer.limit_val_batches=2",
                "callbacks=none",
                "logger=null",
                f"paths.log_dir={tmp_path}/logs",
            ],
        )
        set_runtime(output_dir=str(tmp_path / "out"), cwd=str(tmp_path))
        resolve_config(cfg)
        dm = C.instantiate(cfg.data)
        model = C.instantiate(cfg.model)
        model.env_factory = lambda module: FakeEnv()
        trainer = C.instantiate(cfg.trainer, callbacks=[], logger=None)
        trainer.fit(model, datamodule=dm)
        out = model.best_val_metrics.compute()
        assert out["val/mean_success"] == 1.0

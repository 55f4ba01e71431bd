"""Image-encoder tests: ResNet topology, channel inflation, torch porting,
and the ACT RGB path end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudmatters_tpu.models.components.img_encoder.resnet import (
    ResNetTorchVision,
    load_torch_state_dict,
)


def _init(model, shape, train=False):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=train)
    return x, variables


class TestResNet:
    def test_resnet18_shapes(self):
        m = ResNetTorchVision(resnet_model="resnet18", channels=3, resize_to=64)
        x, variables = _init(m, (2, 64, 64, 3))
        out = m.apply(variables, x, train=False)
        assert out.shape == (2, 2, 2, 512)  # 64 / 32 spatial reduction
        assert m.num_channels == 512

    def test_resnet50_shapes_and_resize(self):
        m = ResNetTorchVision(resnet_model="resnet50", channels=3)
        x, variables = _init(m, (1, 128, 128, 3))  # resized to 224 in forward
        out = m.apply(variables, x, train=False)
        assert out.shape == (1, 7, 7, 2048)
        assert m.num_channels == 2048

    def test_channel_variants(self):
        for ch in (1, 4, 6):
            m = ResNetTorchVision(resnet_model="resnet18", channels=ch,
                                  resize_to=32)
            x, variables = _init(m, (1, 32, 32, ch))
            out = m.apply(variables, x, train=False)
            assert out.shape[-1] == 512, ch

    def test_avg_pool(self):
        m = ResNetTorchVision(resnet_model="resnet18", channels=3,
                              avg_pool=True, resize_to=32)
        x, variables = _init(m, (2, 32, 32, 3))
        out = m.apply(variables, x, train=False)
        assert out.shape == (2, 512)

    def test_param_count_matches_torchvision(self):
        """resnet50 backbone (no fc) must have torchvision's parameter count:
        25,557,032 total minus fc (2048*1000 + 1000) = 23,508,032."""
        m = ResNetTorchVision(resnet_model="resnet50", channels=3)
        _, variables = _init(m, (1, 224, 224, 3))
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
        n_stats = sum(
            int(np.prod(p.shape))
            for path, p in jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
            if "mean" in jax.tree_util.keystr(path) or "var" in jax.tree_util.keystr(path)
        )
        # torch counts conv + bn affine as trainable params (23,508,032);
        # running stats live in batch_stats, not params
        assert n_params == 23_508_032
        assert n_stats == 53_120

    def test_torch_state_dict_port(self):
        """Round-trip a synthetic torch-style state dict through the porting
        map and check a known activation path changes accordingly."""
        import torch

        m = ResNetTorchVision(resnet_model="resnet18", channels=4, resize_to=32)
        x, variables = _init(m, (1, 32, 32, 4))

        # synthesize a torchvision-shaped state dict (3-channel conv1)
        sd = {}
        sd["conv1.weight"] = torch.randn(64, 3, 7, 7)
        sd["bn1.weight"] = torch.rand(64) + 0.5
        sd["bn1.bias"] = torch.randn(64)
        sd["bn1.running_mean"] = torch.randn(64)
        sd["bn1.running_var"] = torch.rand(64) + 0.5
        stages = {1: 64, 2: 128, 3: 256, 4: 512}
        for s, width in stages.items():
            for b in range(2):
                prefix = f"layer{s}.{b}"
                in_w = width if not (b == 0 and s > 1) else width // 2
                sd[f"{prefix}.conv1.weight"] = torch.randn(width, in_w, 3, 3)
                sd[f"{prefix}.conv2.weight"] = torch.randn(width, width, 3, 3)
                for i in (1, 2):
                    sd[f"{prefix}.bn{i}.weight"] = torch.rand(width) + 0.5
                    sd[f"{prefix}.bn{i}.bias"] = torch.randn(width)
                    sd[f"{prefix}.bn{i}.running_mean"] = torch.randn(width)
                    sd[f"{prefix}.bn{i}.running_var"] = torch.rand(width) + 0.5
                if b == 0 and s > 1:
                    sd[f"{prefix}.downsample.0.weight"] = torch.randn(width, width // 2, 1, 1)
                    sd[f"{prefix}.downsample.1.weight"] = torch.rand(width) + 0.5
                    sd[f"{prefix}.downsample.1.bias"] = torch.randn(width)
                    sd[f"{prefix}.downsample.1.running_mean"] = torch.randn(width)
                    sd[f"{prefix}.downsample.1.running_var"] = torch.rand(width) + 0.5

        params, stats = load_torch_state_dict(
            jax.device_get(variables["params"]),
            jax.device_get(variables["batch_stats"]),
            sd, channels=4,
        )
        # conv1: first 3 channels copied (HWIO layout), 4th zeroed
        kernel = params["conv1"]["kernel"]
        np.testing.assert_allclose(
            kernel[..., :3, :],
            np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)),
        )
        np.testing.assert_array_equal(kernel[..., 3, :], 0.0)
        # forward with ported weights runs and is finite
        out = m.apply({"params": params, "batch_stats": stats},
                      jnp.ones((1, 32, 32, 4)), train=False)
        assert np.all(np.isfinite(np.asarray(out)))


class TestACTImagePath:
    def test_act_rgb_forward(self):
        from pointcloudmatters_tpu.models.components.act.act import ACT
        from pointcloudmatters_tpu.models.components.act.positional_encoding import (
            PositionEmbeddingSine,
        )
        from pointcloudmatters_tpu.models.components.act.transformer import (
            Transformer,
            TransformerEncoder,
        )

        hidden = 32
        policy = ACT(
            backbone=ResNetTorchVision(resnet_model="resnet18", channels=4,
                                       resize_to=32),
            transformer=Transformer(d_model=hidden, nhead=4,
                                    num_encoder_layers=1, num_decoder_layers=2,
                                    dim_feedforward=16,
                                    return_intermediate_dec=True),
            encoder=TransformerEncoder(d_model=hidden, nhead=4,
                                       dim_feedforward=16, num_layers=1),
            hidden_dim=hidden, num_queries=4, num_cameras=2,
            action_dim=7, qpos_dim=9, goal_cond_dim=3,
            obs_feature_pos_embedding=PositionEmbeddingSine(
                num_pos_feats=hidden // 2, normalize=True
            ),
        )
        rng = jax.random.PRNGKey(0)
        data = {
            "qpos": jnp.zeros((2, 9)),
            "actions": jax.random.normal(rng, (2, 4, 7)),
            "is_pad": jnp.zeros((2, 4), bool),
            "goal_cond": jnp.zeros((2, 3)),
            "image": jax.random.uniform(rng, (2, 2, 32, 32, 4)),
        }
        variables = policy.init({"params": rng, "vae": rng, "dropout": rng},
                                data, train=True)
        out, _ = policy.apply(variables, data, train=True,
                              rngs={"vae": rng, "dropout": rng},
                              mutable=["batch_stats"])
        assert out["a_hat"].shape == (2, 4, 7)
        assert np.isfinite(float(out["loss"]))

        ev = {k: v for k, v in data.items() if k not in ("actions", "is_pad")}
        out_ev = policy.apply(variables, ev, train=False)
        assert out_ev["a_hat"].shape == (2, 4, 7)

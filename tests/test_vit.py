"""ViT encoder tests: feature modes, masking, channel variants, torch-port
parity of a full transformer block."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudmatters_tpu.models.components.img_encoder.vit import (
    MAEViT,
    ViT,
    VisionTransformer,
    _Block,
    get_2d_sincos_pos_embed,
    load_torch_vit_state_dict,
)

D, HEADS, DEPTH, P = 32, 4, 2, 8


def tiny_vt(**kw):
    return VisionTransformer(
        img_size=32, patch_size=P, channels=kw.pop("channels", 3),
        embed_dim=D, depth=DEPTH, num_heads=HEADS, **kw,
    )


class TestVisionTransformer:
    def test_feature_modes(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
        for mode, shape in (
            ("use_cls_token", (2, D)),
            ("global_pool", (2, D)),
            ("reshape_embedding", (2, 4, 4, D)),
        ):
            m = tiny_vt(classifier_feature=mode)
            v = m.init(jax.random.PRNGKey(0), x)
            assert m.apply(v, x).shape == shape, mode

    def test_masking_train_only(self):
        m = tiny_vt(mask_ratio=0.5)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "mask": jax.random.PRNGKey(1)}, x, train=True)
        out_train = m.apply(v, x, train=True, rngs={"mask": jax.random.PRNGKey(2)})
        out_eval = m.apply(v, x, train=False)  # no mask rng needed at eval
        assert out_train.shape == out_eval.shape == (2, D)

    def test_channel_variants(self):
        for ch in (1, 4, 6):
            m = ViT(model_name="vit_base_patch16", channels=ch, img_size=32)
            # full-size base ViT is heavy; just check the wrapper preprocess
            x = jnp.zeros((1, 32, 32, ch))
            normed = m._preprocess(x)
            assert normed.shape[-1] == ch

    def test_sincos_table(self):
        tab = get_2d_sincos_pos_embed(D, 4, cls_token=True)
        assert tab.shape == (17, D)
        np.testing.assert_array_equal(tab[0], 0.0)  # cls slot zero


class TestTorchPort:
    def _torch_sd(self, rng):
        import torch

        torch.manual_seed(0)
        sd = {
            "patch_embed.proj.weight": torch.randn(D, 3, P, P),
            "patch_embed.proj.bias": torch.randn(D),
            "pos_embed": torch.randn(1, 17, D),
            "cls_token": torch.randn(1, 1, D),
            "norm.weight": torch.rand(D), "norm.bias": torch.randn(D),
        }
        for i in range(DEPTH):
            sd[f"blocks.{i}.norm1.weight"] = torch.rand(D)
            sd[f"blocks.{i}.norm1.bias"] = torch.randn(D)
            sd[f"blocks.{i}.norm2.weight"] = torch.rand(D)
            sd[f"blocks.{i}.norm2.bias"] = torch.randn(D)
            sd[f"blocks.{i}.attn.qkv.weight"] = torch.randn(3 * D, D)
            sd[f"blocks.{i}.attn.qkv.bias"] = torch.randn(3 * D)
            sd[f"blocks.{i}.attn.proj.weight"] = torch.randn(D, D)
            sd[f"blocks.{i}.attn.proj.bias"] = torch.randn(D)
            sd[f"blocks.{i}.mlp.fc1.weight"] = torch.randn(4 * D, D)
            sd[f"blocks.{i}.mlp.fc1.bias"] = torch.randn(4 * D)
            sd[f"blocks.{i}.mlp.fc2.weight"] = torch.randn(D, 4 * D)
            sd[f"blocks.{i}.mlp.fc2.bias"] = torch.randn(D)
        return sd

    def test_block_matches_torch_math(self):
        """A ported block must reproduce torch's pre-norm MHA + MLP exactly."""
        import torch
        import torch.nn.functional as F

        sd = self._torch_sd(0)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
        vt = tiny_vt()
        v = vt.init(jax.random.PRNGKey(0), x)
        ported = load_torch_vit_state_dict(
            {"model": jax.device_get(v["params"])}, sd, channels=3
        )
        params = ported["model"]["blocks_0"]
        tok = np.random.RandomState(1).randn(1, 5, D).astype(np.float32)

        xt = torch.tensor(tok)
        normed = F.layer_norm(
            xt, (D,), torch.tensor(np.asarray(params["norm1"]["scale"])),
            torch.tensor(np.asarray(params["norm1"]["bias"])),
        )
        qkv = normed @ sd["blocks.0.attn.qkv.weight"].T + sd["blocks.0.attn.qkv.bias"]
        q, k, vv = qkv.chunk(3, dim=-1)
        hd = D // HEADS
        q = q.view(1, 5, HEADS, hd).transpose(1, 2)
        k = k.view(1, 5, HEADS, hd).transpose(1, 2)
        vv = vv.view(1, 5, HEADS, hd).transpose(1, 2)
        att = torch.softmax(q @ k.transpose(-2, -1) / hd ** 0.5, -1) @ vv
        att = att.transpose(1, 2).reshape(1, 5, D)
        att = att @ sd["blocks.0.attn.proj.weight"].T + sd["blocks.0.attn.proj.bias"]
        mid = (xt + att)
        mlp_in = F.layer_norm(
            mid, (D,), torch.tensor(np.asarray(params["norm2"]["scale"])),
            torch.tensor(np.asarray(params["norm2"]["bias"])),
        )
        h = F.gelu(mlp_in @ sd["blocks.0.mlp.fc1.weight"].T
                   + sd["blocks.0.mlp.fc1.bias"])
        h = h @ sd["blocks.0.mlp.fc2.weight"].T + sd["blocks.0.mlp.fc2.bias"]
        want = (mid + h).numpy()

        got = _Block(D, HEADS).apply({"params": params}, jnp.asarray(tok))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)

    def test_channel_inflation(self):
        sd = self._torch_sd(0)
        x4 = jnp.zeros((1, 32, 32, 4))
        vt4 = tiny_vt(channels=4)
        v4 = vt4.init(jax.random.PRNGKey(0), x4)
        ported = load_torch_vit_state_dict(
            {"model": jax.device_get(v4["params"])}, sd, channels=4
        )
        kernel = ported["model"]["patch_embed_proj"]["kernel"]
        np.testing.assert_array_equal(kernel[..., 3, :], 0.0)
        np.testing.assert_allclose(
            kernel[..., :3, :],
            np.transpose(sd["patch_embed.proj.weight"].numpy(), (2, 3, 1, 0)),
        )


class TestActWithViT:
    def test_act_vit_pooled_token(self):
        """ViT feeds ACT a pooled (B, D) feature -> single obs token
        (`act/act.py:219-221`)."""
        from pointcloudmatters_tpu.models.components.act.act import ACT
        from pointcloudmatters_tpu.models.components.act.positional_encoding import (
            PositionEmbeddingSine,
        )
        from pointcloudmatters_tpu.models.components.act.transformer import (
            Transformer,
            TransformerEncoder,
        )

        hidden = 32

        class TinyViTEncoder(VisionTransformer):
            pass

        policy = ACT(
            backbone=tiny_vt(),
            transformer=Transformer(d_model=hidden, nhead=4,
                                    num_encoder_layers=1, num_decoder_layers=1,
                                    dim_feedforward=16,
                                    return_intermediate_dec=True),
            encoder=TransformerEncoder(d_model=hidden, nhead=4,
                                       dim_feedforward=16, num_layers=1),
            hidden_dim=hidden, num_queries=4, num_cameras=1,
            action_dim=7, qpos_dim=9, goal_cond_dim=0,
            obs_feature_pos_embedding=PositionEmbeddingSine(
                num_pos_feats=hidden // 2, normalize=True
            ),
        )
        rng = jax.random.PRNGKey(0)
        data = {
            "qpos": jnp.zeros((2, 9)),
            "actions": jnp.zeros((2, 4, 7)),
            "is_pad": jnp.zeros((2, 4), bool),
            "image": jnp.asarray(
                np.random.RandomState(0).rand(2, 1, 32, 32, 3), jnp.float32
            ),
        }
        variables = policy.init({"params": rng, "vae": rng, "dropout": rng},
                                data, train=True)
        out, _ = policy.apply(variables, data, train=True,
                              rngs={"vae": rng, "dropout": rng},
                              mutable=["batch_stats"])
        assert out["a_hat"].shape == (2, 4, 7)


class TestMultiViT:
    def test_global_token_output(self):
        import jax
        import jax.numpy as jnp

        from pointcloudmatters_tpu.models.components.img_encoder.multivit import (
            MultiViTModel,
            truncated_depth_standardize,
        )

        m = MultiViTModel(img_size=32, dim_tokens=32, depth=2, num_heads=4)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 4), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 32)
        assert m.num_channels == 32

        # truncated standardization: roughly zero-mean over the kept quantiles
        d = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 1), jnp.float32)
        sd = truncated_depth_standardize(d)
        assert abs(float(jnp.mean(sd))) < 0.5

    def test_torch_port(self):
        import jax
        import jax.numpy as jnp
        import torch

        from pointcloudmatters_tpu.models.components.img_encoder.multivit import (
            MultiViTModel,
            load_torch_multimae_state_dict,
        )

        D, heads, depth, P = 32, 4, 2, 16
        m = MultiViTModel(img_size=32, dim_tokens=D, depth=depth, num_heads=heads)
        x = jnp.zeros((1, 32, 32, 4))
        v = m.init(jax.random.PRNGKey(0), x)
        sd = {"global_tokens": torch.randn(1, 1, D),
              # semseg keys must be dropped by the loader
              "input_adapters.semseg.proj.weight": torch.randn(D, 64, 4, 4)}
        for mod, ch in (("rgb", 3), ("depth", 1)):
            sd[f"input_adapters.{mod}.proj.weight"] = torch.randn(D, ch, P, P)
            sd[f"input_adapters.{mod}.proj.bias"] = torch.randn(D)
        for i in range(depth):
            sd[f"encoder.{i}.norm1.weight"] = torch.rand(D)
            sd[f"encoder.{i}.norm1.bias"] = torch.randn(D)
            sd[f"encoder.{i}.norm2.weight"] = torch.rand(D)
            sd[f"encoder.{i}.norm2.bias"] = torch.randn(D)
            sd[f"encoder.{i}.attn.qkv.weight"] = torch.randn(3 * D, D)
            sd[f"encoder.{i}.attn.qkv.bias"] = torch.randn(3 * D)
            sd[f"encoder.{i}.attn.proj.weight"] = torch.randn(D, D)
            sd[f"encoder.{i}.attn.proj.bias"] = torch.randn(D)
            sd[f"encoder.{i}.mlp.fc1.weight"] = torch.randn(4 * D, D)
            sd[f"encoder.{i}.mlp.fc1.bias"] = torch.randn(4 * D)
            sd[f"encoder.{i}.mlp.fc2.weight"] = torch.randn(D, 4 * D)
            sd[f"encoder.{i}.mlp.fc2.bias"] = torch.randn(D)
        ported = load_torch_multimae_state_dict(
            jax.device_get(v["params"]), sd
        )
        out = m.apply({"params": ported}, jnp.ones((1, 32, 32, 4)))
        np.testing.assert_array_equal(
            np.asarray(ported["model"]["global_tokens"]),
            sd["global_tokens"].numpy(),
        )
        assert np.all(np.isfinite(np.asarray(out)))


class TestPretrainedWiring:
    def test_pretrained_path_loaded_at_init(self, tmp_path):
        """BCModule.initial_state ports a torch checkpoint declared via
        pretrained_path on the backbone."""
        import jax
        import jax.numpy as jnp
        import torch

        from pointcloudmatters_tpu.models.bc_module import BCModule
        from pointcloudmatters_tpu.models.components.act.act import ACT
        from pointcloudmatters_tpu.models.components.act.positional_encoding import (
            PositionEmbeddingSine,
        )
        from pointcloudmatters_tpu.models.components.act.transformer import (
            Transformer,
            TransformerEncoder,
        )
        from pointcloudmatters_tpu.models.components.img_encoder.resnet import (
            ResNetTorchVision,
        )

        # synthesize a torchvision resnet18 state dict file
        sd = {}
        sd["conv1.weight"] = torch.randn(64, 3, 7, 7)
        for n, width in (("bn1", 64),):
            sd[f"{n}.weight"] = torch.rand(width)
            sd[f"{n}.bias"] = torch.randn(width)
            sd[f"{n}.running_mean"] = torch.randn(width)
            sd[f"{n}.running_var"] = torch.rand(width) + 0.5
        widths = {1: 64, 2: 128, 3: 256, 4: 512}
        for s_, width in widths.items():
            for b in range(2):
                pre = f"layer{s_}.{b}"
                in_w = width if not (b == 0 and s_ > 1) else width // 2
                sd[f"{pre}.conv1.weight"] = torch.randn(width, in_w, 3, 3)
                sd[f"{pre}.conv2.weight"] = torch.randn(width, width, 3, 3)
                for i in (1, 2):
                    sd[f"{pre}.bn{i}.weight"] = torch.rand(width)
                    sd[f"{pre}.bn{i}.bias"] = torch.randn(width)
                    sd[f"{pre}.bn{i}.running_mean"] = torch.randn(width)
                    sd[f"{pre}.bn{i}.running_var"] = torch.rand(width) + 0.5
                if b == 0 and s_ > 1:
                    sd[f"{pre}.downsample.0.weight"] = torch.randn(width, width // 2, 1, 1)
                    sd[f"{pre}.downsample.1.weight"] = torch.rand(width)
                    sd[f"{pre}.downsample.1.bias"] = torch.randn(width)
                    sd[f"{pre}.downsample.1.running_mean"] = torch.randn(width)
                    sd[f"{pre}.downsample.1.running_var"] = torch.rand(width) + 0.5
        ckpt = str(tmp_path / "resnet18.pt")
        torch.save(sd, ckpt)

        hidden = 32
        policy = ACT(
            backbone=ResNetTorchVision(resnet_model="resnet18", channels=3,
                                       resize_to=32, pretrained_path=ckpt),
            transformer=Transformer(d_model=hidden, nhead=4,
                                    num_encoder_layers=1, num_decoder_layers=1,
                                    dim_feedforward=16,
                                    return_intermediate_dec=True),
            encoder=TransformerEncoder(d_model=hidden, nhead=4,
                                       dim_feedforward=16, num_layers=1),
            hidden_dim=hidden, num_queries=4, num_cameras=1,
            action_dim=7, qpos_dim=9,
            obs_feature_pos_embedding=PositionEmbeddingSine(
                num_pos_feats=hidden // 2, normalize=True
            ),
        )
        module = BCModule(policy=policy)
        module._opt_knobs = dict(total_steps=10, gradient_clip_val=None,
                                 accumulate_grad_batches=1)
        batch = {
            "qpos": jnp.zeros((2, 9)),
            "actions": jnp.zeros((2, 4, 7)),
            "is_pad": jnp.zeros((2, 4), bool),
            "image": jnp.zeros((2, 1, 32, 32, 3)),
        }
        state = module.initial_state(batch)
        kernel = np.asarray(state.params["backbone"]["conv1"]["kernel"])
        np.testing.assert_allclose(
            kernel, np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)),
            atol=1e-6,
        )

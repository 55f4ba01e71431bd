"""bf16-mixed dtype discipline: no component may silently promote to f32.

Round-1 lesson: two separate ~15% step-time regressions came from f32
constants (positional-embedding tables, sinusoidal timestep embeddings,
DDPM schedule coefficients) promoting activations — and everything
downstream of the residual stream — to f32 under bf16-mixed. These tests
pin the contract: with params and inputs cast to bf16 (exactly what
``Trainer._cast_floating`` does inside the train step), the forward output
of every model family must still be bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _bf16(tree):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        tree,
    )


def _check(module, variables, *args, rngs=None, **kwargs):
    static = {k: kwargs.pop(k) for k in ("train", "deterministic")
              if k in kwargs}
    out = module.apply(_bf16(variables), *_bf16(args), rngs=rngs,
                       mutable=["batch_stats"], **_bf16(kwargs), **static)
    out = out[0] if isinstance(out, tuple) else out
    leaves = [
        x for x in jax.tree.leaves(out)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    ]
    assert leaves, "no floating outputs to check"
    bad = {str(x.dtype) for x in leaves if x.dtype != jnp.bfloat16}
    assert not bad, f"promoted to {bad}"


class TestDtypePolicy:
    def test_act_transformer(self):
        from pointcloudmatters_tpu.models.components.act.transformer import (
            Transformer,
        )

        m = Transformer(d_model=32, nhead=4, num_encoder_layers=1,
                        num_decoder_layers=1, dim_feedforward=16,
                        return_intermediate_dec=True)
        rng = np.random.RandomState(0)
        src = jnp.asarray(rng.randn(2, 24, 32), jnp.float32)
        qe = jnp.asarray(rng.randn(5, 32), jnp.float32)
        pos = jnp.asarray(rng.randn(1, 24, 32), jnp.float32)  # f32 table
        v = m.init(jax.random.key(0), src, qe, pos=pos, deterministic=True)
        _check(m, v, src, qe, pos, deterministic=True)

    def test_conditional_unet1d(self):
        from pointcloudmatters_tpu.models.components.diffusion_policy.diffusion.conditional_unet1d import (
            ConditionalUnet1D,
        )

        m = ConditionalUnet1D(input_dim=7, global_cond_dim=20,
                              down_dims=(32, 64), diffusion_step_embed_dim=16)
        x = jnp.zeros((2, 8, 7), jnp.float32)
        t = jnp.zeros((2,), jnp.int32)
        gc = jnp.zeros((2, 20), jnp.float32)
        v = m.init(jax.random.key(0), x, timestep=t, global_cond=gc)
        _check(m, v, x, timestep=t, global_cond=gc)

    def test_transformer_for_diffusion(self):
        from pointcloudmatters_tpu.models.components.diffusion_policy.diffusion.transformer_for_diffusion import (
            TransformerForDiffusion,
        )

        m = TransformerForDiffusion(input_dim=7, output_dim=7, horizon=8,
                                    n_obs_steps=2, cond_dim=12, n_layer=1,
                                    n_head=2, n_emb=16)
        x = jnp.zeros((2, 8, 7), jnp.float32)
        t = jnp.zeros((2,), jnp.int32)
        cond = jnp.zeros((2, 2, 12), jnp.float32)
        v = m.init(jax.random.key(0), x, t, cond)
        _check(m, v, x, t, cond)

    def test_ddpm_add_noise_keeps_dtype(self):
        from pointcloudmatters_tpu.models.components.diffusion_policy.diffusion.ddpm import (
            DDPMScheduler,
        )

        sch = DDPMScheduler(num_train_timesteps=10)
        x = jnp.zeros((2, 8, 7), jnp.bfloat16)
        eps = jnp.ones((2, 8, 7), jnp.bfloat16)
        t = jnp.asarray([1, 5])
        assert sch.add_noise(x, eps, t).dtype == jnp.bfloat16
        assert sch.step(eps, 5, 3, x, eps).dtype == jnp.bfloat16

    def test_vit(self):
        from pointcloudmatters_tpu.models.components.img_encoder.vit import (
            VisionTransformer,
        )

        m = VisionTransformer(img_size=32, patch_size=8, embed_dim=32,
                              depth=1, num_heads=2)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        v = m.init(jax.random.key(0), x, train=False)
        _check(m, v, x, train=False)

    def test_resnet(self):
        from pointcloudmatters_tpu.models.components.img_encoder.resnet import (
            ResNetTorchVision,
        )

        m = ResNetTorchVision(resnet_model="resnet18")
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        v = m.init(jax.random.key(0), x, train=False)
        _check(m, v, x, train=False)

    def test_pointnet(self):
        from pointcloudmatters_tpu.models.components.pcd_encoder.pointnet import (
            PointNet,
        )

        m = PointNet(in_channels=6)
        rng = np.random.RandomState(0)
        pcd = {
            "coord": jnp.asarray(rng.randn(2, 64, 3), jnp.float32),
            "feat": jnp.asarray(rng.randn(2, 64, 6), jnp.float32),
            "valid": jnp.ones((2, 64), bool),
        }
        v = m.init(jax.random.key(0), pcd, train=False)
        _check(m, v, pcd, train=False)

    def test_multivit(self):
        from pointcloudmatters_tpu.models.components.img_encoder.multivit import (
            MultiViT,
        )

        m = MultiViT(input_modalities={"rgb": 3, "depth": 1}, patch_size=8,
                     dim_tokens=32, depth=1, num_heads=2)
        x = {"rgb": jnp.zeros((2, 32, 32, 3), jnp.float32),
             "depth": jnp.zeros((2, 32, 32, 1), jnp.float32)}
        v = m.init(jax.random.key(0), x)
        _check(m, v, x)

    def test_spunet(self):
        from pointcloudmatters_tpu.models.components.pcd_encoder.spunet import (
            SpUNet,
        )

        m = SpUNet(in_channels=6, num_classes=32, channels=(8, 8, 8, 8, 8, 8, 8, 8),
                   layers=(1, 1, 1, 1, 1, 1, 1, 1), cls_mode=True)
        rng = np.random.RandomState(0)
        pcd = {
            "coord": jnp.asarray(rng.rand(2, 64, 3) * 0.5, jnp.float32),
            "grid_coord": jnp.asarray(rng.randint(0, 16, (2, 64, 3)), jnp.int32),
            "feat": jnp.asarray(rng.randn(2, 64, 6), jnp.float32),
            "valid": jnp.ones((2, 64), bool),
        }
        v = m.init(jax.random.key(0), pcd, train=False)
        _check(m, v, pcd, train=False)

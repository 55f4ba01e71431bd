"""Round-trip tests for scripts/port_reference_ckpt.py.

Save a fake Lightning checkpoint built from reference(-shaped) torch
modules, run the porter CLI, load the Orbax output, and assert our policy's
forward matches the torch forward — the product-grade version of the
mapping machinery proven in tests/test_reference_parity.py.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
import _reference_stubs as RS  # noqa: E402

if not RS.install():  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

# import reference modules at module scope while the reference root is first
# on sys.path — pytest re-prepends the repo rootdir between collection and
# execution, and our own `src/` entry-point package would shadow it
import src.models.components.act.act  # noqa: F401, E402
import src.models.components.act.transformer  # noqa: F401, E402
import src.models.components.loss.misc  # noqa: F401, E402
import src.models.components.diffusion_policy.diffusion.conditional_unet1d  # noqa: F401, E402

import jax.numpy as jnp  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _porter():
    spec = importlib.util.spec_from_file_location(
        "port_reference_ckpt",
        os.path.join(REPO, "scripts", "port_reference_ckpt.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _save_lightning_ckpt(path, module_sd: dict):
    torch.save(
        {"state_dict": {f"policy.{k}": v for k, v in module_sd.items()},
         "epoch": 3, "global_step": 123},
        path,
    )


def _restore(path):
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


# ---------------------------------------------------------------------------
# spconv-shaped PointNet stand-in (spconv itself is CUDA-only)
# ---------------------------------------------------------------------------

class _SpconvLikeConv(torch.nn.Module):
    """Weight stored in spconv2's (out, 1, 1, 1, in) layout; forward is the
    plain per-point linear map a k=1 submanifold conv computes."""

    def __init__(self, cin, cout):
        super().__init__()
        self.weight = torch.nn.Parameter(torch.randn(cout, 1, 1, 1, cin) * 0.2)

    def forward(self, x):
        return x @ self.weight.reshape(self.weight.shape[0], -1).t()


class _TorchPointNet(torch.nn.Module):
    """State-dict mirror of the reference spconv PointNet
    (`pcd_encoder/pointnet.py:16-62`): conv{i}.0 = k=1 conv, conv{i}.1 = BN."""

    num_channels = 512

    def __init__(self, in_ch=6):
        super().__init__()
        widths = (64, 64, 64, 128, 512)
        prev = in_ch
        for i, w in enumerate(widths):
            seq = torch.nn.Sequential(
                _SpconvLikeConv(prev, w),
                torch.nn.BatchNorm1d(w, eps=1e-3, momentum=0.01),
                torch.nn.ReLU(),
            )
            setattr(self, f"conv{i + 1}", seq)
            prev = w

    def forward(self, pcd_dict):
        x = pcd_dict["feat"]
        for i in range(5):
            x = getattr(self, f"conv{i + 1}")(x)
        return x


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(*m.running_mean.shape).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                rng.rand(*m.running_var.shape).astype(np.float32) + 0.5))


# ---------------------------------------------------------------------------
# ACTPCD + PointNet
# ---------------------------------------------------------------------------

def test_actpcd_pointnet_roundtrip(tmp_path):
    import src.models.components.act.act as ref_act
    from src.models.components.act.transformer import (
        Transformer as RefT,
        TransformerEncoder as RefE,
    )
    from src.models.components.loss.misc import KLDivergence as RefKL

    from tests.test_reference_parity import (
        _packed_batch,
        _padded_pcds,
        n2t,
    )
    from pointcloudmatters_tpu.models.components.act.act import ACTPCD
    from pointcloudmatters_tpu.models.components.act.transformer import (
        Transformer,
        TransformerEncoder,
    )
    from pointcloudmatters_tpu.models.components.pcd_encoder.pointnet import (
        PointNet,
    )

    RS.install_pointops_adapters()
    ref_act.reparametrize = lambda mu, logvar: mu

    HID, NHEAD, FFN, CHUNK = 96, 4, 32, 10  # hidden % 6 == 0 (3D sine emb)
    ADIM, QDIM, GDIM, NPTS, NSMP = 7, 9, 3, 32, 4
    torch.manual_seed(0)
    ref = ref_act.ACTPCD(
        backbone=_TorchPointNet(6),
        transformer=RefT(d_model=HID, nhead=NHEAD, num_encoder_layers=2,
                         num_decoder_layers=2, dim_feedforward=FFN,
                         dropout=0.0, normalize_before=False,
                         return_intermediate_dec=True),
        encoder=RefE(d_model=HID, nhead=NHEAD, dim_feedforward=FFN,
                     dropout=0.0, num_layers=2),
        hidden_dim=HID, num_queries=CHUNK, num_cameras=0,
        action_dim=ADIM, qpos_dim=QDIM, latent_dim=16,
        action_loss=torch.nn.L1Loss(reduction="none"), klloss=RefKL(),
        kl_weight=10.0, goal_cond_dim=GDIM,
        pcd_nsample=NSMP, pcd_npoints=NPTS,
    )
    with torch.no_grad():
        _randomize_bn_stats(ref, np.random.RandomState(1))
    ref.eval()

    ckpt = tmp_path / "ref.ckpt"
    _save_lightning_ckpt(ckpt, ref.state_dict())
    out = tmp_path / "orbax"
    porter = _porter()
    porter.main([str(ckpt), str(out), "--nhead", str(NHEAD)])
    item = _restore(out)
    # epoch=-1: restore resumes at saved+1, i.e. trains from epoch 0
    assert item["epoch"] == -1 and item["step"] == 0

    ours = ACTPCD(
        backbone=PointNet(in_channels=6),
        transformer=Transformer(d_model=HID, nhead=NHEAD,
                                num_encoder_layers=2, num_decoder_layers=2,
                                dim_feedforward=FFN, dropout=0.0,
                                normalize_before=False,
                                return_intermediate_dec=True),
        encoder=TransformerEncoder(d_model=HID, nhead=NHEAD,
                                   dim_feedforward=FFN, dropout=0.0,
                                   num_layers=2),
        hidden_dim=HID, num_queries=CHUNK, num_cameras=0,
        action_dim=ADIM, qpos_dim=QDIM, latent_dim=16,
        action_loss="l1", kl_weight=10.0, goal_cond_dim=GDIM,
        pcd_nsample=NSMP, pcd_npoints=NPTS,
    )

    counts, coords, feats, offset, qpos, actions, is_pad, goal = _packed_batch()
    ref_dict = {
        "qpos": n2t(qpos), "actions": n2t(actions),
        "is_pad": torch.from_numpy(is_pad), "goal_cond": n2t(goal),
        "pcds": {
            "coord": n2t(np.concatenate(coords)),
            "feat": n2t(np.concatenate(feats)),
            "offset": torch.from_numpy(offset),
        },
    }
    with torch.no_grad():
        r = ref(ref_dict)

    o = ours.apply(
        {"params": item["params"], "batch_stats": item["batch_stats"]},
        {
            "qpos": jnp.asarray(qpos), "actions": jnp.asarray(actions),
            "is_pad": jnp.asarray(is_pad), "goal_cond": jnp.asarray(goal),
            "pcds": _padded_pcds(counts, coords, feats),
        },
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(o["a_hat"]), r["a_hat"].numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(o["is_pad_hat"]), r["is_pad_hat"].numpy(), atol=2e-3
    )


# ---------------------------------------------------------------------------
# ACT (state-only path)
# ---------------------------------------------------------------------------

def test_act_state_only_roundtrip(tmp_path):
    """State-only ACT: the reference's own state path is dead code (its 2-D
    src cannot pass the transformer's 4-D unpack, `act/transformer.py:73`),
    so instead of a forward comparison this asserts the ported tree is
    structurally identical to our init tree with exactly-mapped leaves."""
    import jax
    import src.models.components.act.act as ref_act
    from src.models.components.act.transformer import (
        Transformer as RefT,
        TransformerEncoder as RefE,
    )
    from src.models.components.loss.misc import KLDivergence as RefKL

    from pointcloudmatters_tpu.models.components.act.act import ACT
    from pointcloudmatters_tpu.models.components.act.transformer import (
        Transformer,
        TransformerEncoder,
    )

    HID, NHEAD, FFN, CHUNK, ADIM, QDIM, EDIM = 64, 4, 32, 8, 7, 9, 5
    torch.manual_seed(1)
    ref = ref_act.ACT(
        backbone=None,
        transformer=RefT(d_model=HID, nhead=NHEAD, num_encoder_layers=2,
                         num_decoder_layers=2, dim_feedforward=FFN,
                         dropout=0.0, normalize_before=False,
                         return_intermediate_dec=True),
        encoder=RefE(d_model=HID, nhead=NHEAD, dim_feedforward=FFN,
                     dropout=0.0, num_layers=2),
        hidden_dim=HID, num_queries=CHUNK, num_cameras=0,
        action_dim=ADIM, qpos_dim=QDIM, env_state_dim=EDIM, latent_dim=16,
        action_loss=torch.nn.L1Loss(reduction="none"), klloss=RefKL(),
        kl_weight=10.0,
    )

    ckpt = tmp_path / "ref.ckpt"
    _save_lightning_ckpt(ckpt, ref.state_dict())
    out = tmp_path / "orbax"
    _porter().main([str(ckpt), str(out), "--nhead", str(NHEAD)])
    item = _restore(out)

    ours = ACT(
        backbone=None,
        transformer=Transformer(d_model=HID, nhead=NHEAD,
                                num_encoder_layers=2, num_decoder_layers=2,
                                dim_feedforward=FFN, dropout=0.0,
                                normalize_before=False,
                                return_intermediate_dec=True),
        encoder=TransformerEncoder(d_model=HID, nhead=NHEAD,
                                   dim_feedforward=FFN, dropout=0.0,
                                   num_layers=2),
        hidden_dim=HID, num_queries=CHUNK, num_cameras=0,
        action_dim=ADIM, qpos_dim=QDIM, env_state_dim=EDIM, latent_dim=16,
        action_loss="l1", kl_weight=10.0,
    )
    rng = np.random.RandomState(2)
    B = 3
    batch = {
        "qpos": jnp.asarray(rng.randn(B, QDIM).astype(np.float32)),
        "env_state": jnp.asarray(rng.randn(B, EDIM).astype(np.float32)),
        "actions": jnp.asarray(rng.randn(B, CHUNK, ADIM).astype(np.float32)),
        "is_pad": jnp.zeros((B, CHUNK), bool),
    }
    import jax as _jax

    template = ours.init(
        {"params": _jax.random.PRNGKey(0), "vae": _jax.random.PRNGKey(1)},
        batch, train=False,
    )["params"]

    def paths(tree, prefix=""):
        if isinstance(tree, dict):
            out = set()
            for k, v in tree.items():
                out |= paths(v, f"{prefix}/{k}")
            return out
        return {f"{prefix}:{tuple(np.shape(tree))}"}

    assert paths(item["params"]) == paths(template)
    # spot-check exactly-mapped leaves
    np.testing.assert_array_equal(
        item["params"]["input_proj_env_state"]["kernel"],
        ref.input_proj_env_state.weight.detach().numpy().T,
    )
    np.testing.assert_array_equal(
        item["params"]["state_pos_embed"], ref.pos.weight.detach().numpy()
    )
    # the forward actually runs with the ported weights (ours is not dead code)
    o = ours.apply({"params": item["params"]}, batch, train=False,
                   rngs={"vae": _jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(o["a_hat"])).all()


# ---------------------------------------------------------------------------
# Diffusion policy (UNet + normalizer)
# ---------------------------------------------------------------------------

def test_dp_unet_and_normalizer_roundtrip(tmp_path):
    from src.models.components.diffusion_policy.diffusion.conditional_unet1d import (  # noqa: E501
        ConditionalUnet1D as RefU,
    )
    from pointcloudmatters_tpu.models.components.diffusion_policy.diffusion.conditional_unet1d import (  # noqa: E501
        ConditionalUnet1D as OurU,
    )

    torch.manual_seed(0)
    in_dim, g_dim, T, B = 7, 20, 16, 3
    ref = RefU(input_dim=in_dim, global_cond_dim=g_dim,
               diffusion_step_embed_dim=32, down_dims=[32, 64],
               kernel_size=3, n_groups=8, cond_predict_scale=True)
    ref.eval()

    # wrap as a DP policy state dict: model.* + normalizer params_dict
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    rng = np.random.RandomState(3)
    for field in ("action", "qpos"):
        sd[f"normalizer.params_dict.{field}.scale"] = torch.from_numpy(
            rng.rand(in_dim).astype(np.float32) + 0.5)
        sd[f"normalizer.params_dict.{field}.offset"] = torch.from_numpy(
            rng.randn(in_dim).astype(np.float32))
        for stat in ("min", "max", "mean", "std"):
            sd[f"normalizer.params_dict.{field}.input_stats.{stat}"] = (
                torch.from_numpy(rng.randn(in_dim).astype(np.float32)))

    ckpt = tmp_path / "ref.ckpt"
    _save_lightning_ckpt(ckpt, sd)
    out = tmp_path / "orbax"
    _porter().main([str(ckpt), str(out)])
    item = _restore(out)

    # normalizer extras round-trip into our LinearNormalizer
    from pointcloudmatters_tpu.utils.normalizer import LinearNormalizer

    norm = LinearNormalizer.from_state_dict(item["extras"]["normalizer"])
    x = rng.randn(4, in_dim).astype(np.float32)
    want = x * np.asarray(sd["normalizer.params_dict.action.scale"]) + \
        np.asarray(sd["normalizer.params_dict.action.offset"])
    np.testing.assert_allclose(
        np.asarray(norm.params["action"].normalize(x)), want, rtol=1e-6
    )

    ours = OurU(input_dim=in_dim, global_cond_dim=g_dim,
                diffusion_step_embed_dim=32, down_dims=(32, 64),
                kernel_size=3, n_groups=8, cond_predict_scale=True)
    traj = rng.randn(B, T, in_dim).astype(np.float32)
    t = np.array([3, 77, 15], np.int64)
    cond = rng.randn(B, g_dim).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.from_numpy(traj), torch.from_numpy(t),
                global_cond=torch.from_numpy(cond)).numpy()
    o = ours.apply({"params": item["params"]["model"]}, jnp.asarray(traj),
                   jnp.asarray(t), global_cond=jnp.asarray(cond))
    np.testing.assert_allclose(np.asarray(o), r, atol=1e-4)


# ---------------------------------------------------------------------------
# ACT with a Joiner-ResNet image backbone (structural round-trip)
# ---------------------------------------------------------------------------

def _resnet18_state_dict(rng, in_ch=4, prefix=""):
    """Synthesize torchvision-resnet18-shaped keys (no torchvision here)."""
    sd = {}

    def t(*shape):
        # small magnitudes so the 8-conv random stack stays finite in f32
        return torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.02)

    def bn(p, w):
        sd[f"{p}.weight"] = t(w)
        sd[f"{p}.bias"] = t(w)
        sd[f"{p}.running_mean"] = t(w)
        sd[f"{p}.running_var"] = torch.from_numpy(
            rng.rand(w).astype(np.float32) + 0.5)

    sd[f"{prefix}conv1.weight"] = t(64, in_ch, 7, 7)
    bn(f"{prefix}bn1", 64)
    for s, width in {1: 64, 2: 128, 3: 256, 4: 512}.items():
        for b in range(2):
            p = f"{prefix}layer{s}.{b}"
            in_w = width if not (b == 0 and s > 1) else width // 2
            sd[f"{p}.conv1.weight"] = t(width, in_w, 3, 3)
            sd[f"{p}.conv2.weight"] = t(width, width, 3, 3)
            bn(f"{p}.bn1", width)
            bn(f"{p}.bn2", width)
            if b == 0 and s > 1:
                sd[f"{p}.downsample.0.weight"] = t(width, width // 2, 1, 1)
                bn(f"{p}.downsample.1", width)
    return sd


def test_act_resnet_backbone_roundtrip(tmp_path):
    import jax as _jax
    import src.models.components.act.act as ref_act
    from src.models.components.act.transformer import (
        Transformer as RefT,
        TransformerEncoder as RefE,
    )
    from src.models.components.loss.misc import KLDivergence as RefKL

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

    HID, NHEAD, FFN, CHUNK, ADIM, QDIM = 32, 4, 16, 4, 7, 9

    class _FakeBackbone(torch.nn.Module):
        num_channels = 512

        def forward(self, x):
            return x

    torch.manual_seed(2)
    ref = ref_act.ACT(
        backbone=_FakeBackbone(),
        transformer=RefT(d_model=HID, nhead=NHEAD, num_encoder_layers=1,
                         num_decoder_layers=2, dim_feedforward=FFN,
                         dropout=0.0, normalize_before=False,
                         return_intermediate_dec=True),
        encoder=RefE(d_model=HID, nhead=NHEAD, dim_feedforward=FFN,
                     dropout=0.0, num_layers=1),
        hidden_dim=HID, num_queries=CHUNK, num_cameras=1,
        action_dim=ADIM, qpos_dim=QDIM, latent_dim=16,
        action_loss=torch.nn.L1Loss(reduction="none"), klloss=RefKL(),
        kl_weight=10.0,
    )
    sd = {k: v for k, v in ref.state_dict().items()}
    # graft Joiner-style resnet keys (reference `act/backbone.py:105-140`:
    # backbone = Joiner(Backbone, posemb) -> state keys backbone.0.body.*)
    rng = np.random.RandomState(5)
    sd.update(_resnet18_state_dict(rng, in_ch=4, prefix="backbone.0.body."))

    ckpt = tmp_path / "ref.ckpt"
    _save_lightning_ckpt(ckpt, sd)
    out = tmp_path / "orbax"
    _porter().main([str(ckpt), str(out), "--nhead", str(NHEAD)])
    item = _restore(out)

    ours = ACT(
        backbone=ResNetTorchVision(resnet_model="resnet18", channels=4,
                                   resize_to=64),
        transformer=Transformer(d_model=HID, nhead=NHEAD,
                                num_encoder_layers=1, num_decoder_layers=2,
                                dim_feedforward=FFN, dropout=0.0,
                                normalize_before=False,
                                return_intermediate_dec=True),
        encoder=TransformerEncoder(d_model=HID, nhead=NHEAD,
                                   dim_feedforward=FFN, dropout=0.0,
                                   num_layers=1),
        hidden_dim=HID, num_queries=CHUNK, num_cameras=1,
        action_dim=ADIM, qpos_dim=QDIM, latent_dim=16,
        action_loss="l1", kl_weight=10.0,
        obs_feature_pos_embedding=PositionEmbeddingSine(
            num_pos_feats=HID // 2, normalize=True
        ),
    )
    rngk = _jax.random.PRNGKey(0)
    batch = {
        "qpos": jnp.zeros((2, QDIM)),
        "actions": jnp.zeros((2, CHUNK, ADIM)),
        "is_pad": jnp.zeros((2, CHUNK), bool),
        "image": jnp.zeros((2, 1, 64, 64, 4)),
    }
    template = ours.init({"params": rngk, "vae": rngk}, batch, train=False)

    def paths(tree, prefix=""):
        if isinstance(tree, dict):
            out = set()
            for k, v in tree.items():
                out |= paths(v, f"{prefix}/{k}")
            return out
        return {f"{prefix}:{tuple(np.shape(tree))}"}

    assert paths(item["params"]) == paths(template["params"])
    assert paths(item["batch_stats"]) == paths(template["batch_stats"])
    # conv1 ported without inflation (ckpt already carries 4 channels), HWIO
    np.testing.assert_allclose(
        item["params"]["backbone"]["conv1"]["kernel"],
        np.transpose(np.asarray(sd["backbone.0.body.conv1.weight"]),
                     (2, 3, 1, 0)),
    )
    # input_proj is the reference's 1x1 Conv2d -> our Dense
    np.testing.assert_allclose(
        item["params"]["input_proj"]["kernel"],
        np.asarray(sd["input_proj.weight"])[:, :, 0, 0].T,
    )
    # the ported tree actually runs
    o = ours.apply(
        {"params": item["params"], "batch_stats": item["batch_stats"]},
        batch, train=False, rngs={"vae": rngk},
    )
    assert np.isfinite(np.asarray(o["a_hat"])).all()


# ---------------------------------------------------------------------------
# ACTPCD with a SpUNet backbone (structural round-trip; also the first
# coverage of spunet.load_ponderv2_weights itself)
# ---------------------------------------------------------------------------

def _spunet_state_dict(template_params, template_stats, rng):
    """Invert our SpUNet tree into reference-shaped torch keys
    (`pcd_encoder/spunet.py` attribute naming, spconv2 weight layouts)."""
    sd = {}

    def inv_spconv(w_flax, k):
        # (k^3, in, out) -> (out, k, k, k, in)
        kk, ci, co = w_flax.shape
        return np.transpose(
            rng.randn(kk, ci, co).astype(np.float32) * 0.05, (2, 0, 1)
        ).reshape(co, k, k, k, ci)

    def put_pdbn(scope, torch_prefix):
        tree = template_params[scope]
        stats = template_stats[scope]
        i = 0
        while f"bns_{i}" in tree:
            w = tree[f"bns_{i}"]["scale"].shape[0]
            sd[f"{torch_prefix}.bns.{i}.weight"] = rng.rand(w).astype(np.float32) + 0.5
            sd[f"{torch_prefix}.bns.{i}.bias"] = rng.randn(w).astype(np.float32)
            sd[f"{torch_prefix}.bns.{i}.running_mean"] = rng.randn(w).astype(np.float32) * 0.1
            sd[f"{torch_prefix}.bns.{i}.running_var"] = rng.rand(w).astype(np.float32) + 0.5
            i += 1
        if "modulation" in tree:
            kshape = tree["modulation"]["kernel"].shape  # (ctx, 2w)
            sd[f"{torch_prefix}.modulation.1.weight"] = (
                rng.randn(kshape[1], kshape[0]).astype(np.float32) * 0.05)
            sd[f"{torch_prefix}.modulation.1.bias"] = (
                rng.randn(kshape[1]).astype(np.float32) * 0.05)
        del stats

    k_of = {125: 5, 27: 3, 8: 2, 1: 1}
    for name, leaf in template_params.items():
        if name == "conv_input_weight":
            sd["conv_input.conv.weight"] = inv_spconv(leaf, 5)
        elif name == "conv_input_bn":
            put_pdbn(name, "conv_input.bn")
        elif name == "embedding_table":
            n, c = leaf["embedding"].shape
            sd["embedding_table.weight"] = rng.randn(n, c).astype(np.float32) * 0.05
        elif name == "final_weight":
            sd["final.weight"] = inv_spconv(leaf, 1)
        elif name == "final_bias":
            sd["final.bias"] = rng.randn(*leaf.shape).astype(np.float32)
        elif name.endswith("_weight") and name.startswith(("down", "up")):
            s = name[:-len("_weight")]
            torch_name = f"{s[:-1].rstrip('0123456789') or s}"
            stage = "".join(ch for ch in s if ch.isdigit())
            kind = "down" if s.startswith("down") else "up"
            sd[f"{kind}.{stage}.conv.weight"] = inv_spconv(leaf, 2)
        elif name.endswith("_bn") and name.startswith(("down", "up")):
            s = name[:-len("_bn")]
            stage = "".join(ch for ch in s if ch.isdigit())
            kind = "down" if s.startswith("down") else "up"
            put_pdbn(name, f"{kind}.{stage}.bn")
        elif "_block" in name:
            # enc{s}_block{i}_<leafkind>
            head, leafkind = name.split("_block")[0], name.split("_block")[1]
            i, _, kind = leafkind.partition("_")
            stage = head.replace("enc", "").replace("dec", "")
            enc = "enc" if head.startswith("enc") else "dec"
            tp = f"{enc}.{stage}.block{i}"
            if kind in ("conv1", "conv2"):
                sd[f"{tp}.{kind}.weight"] = inv_spconv(leaf, 3)
            elif kind == "proj":
                sd[f"{tp}.proj_conv.weight"] = inv_spconv(leaf, 1)
            elif kind in ("bn1", "bn2"):
                put_pdbn(name, f"{tp}.{kind}")
            elif kind == "proj_bn":
                put_pdbn(name, f"{tp}.proj_norm")
    return sd


def test_actpcd_spunet_roundtrip(tmp_path):
    import jax as _jax
    from pointcloudmatters_tpu.models.components.pcd_encoder.spunet import (
        SpUNet,
    )

    TINY = dict(base_channels=8, channels=(8, 16, 16, 16, 16, 16, 12, 12),
                layers=(1, 1, 1, 1, 1, 1, 1, 1))
    net = SpUNet(in_channels=6, **TINY)
    d = {
        "grid_coord": jnp.zeros((1, 64, 3), jnp.int32).at[0, :, 0].set(
            jnp.arange(64)),
        "feat": jnp.zeros((1, 64, 6), jnp.float32),
        "valid": jnp.ones((1, 64), bool),
    }
    variables = net.init(_jax.random.PRNGKey(0), d, train=False)
    tp = _jax.tree.map(np.asarray, variables["params"])
    ts = _jax.tree.map(np.asarray, variables["batch_stats"])

    rng = np.random.RandomState(7)
    bsd = _spunet_state_dict(tp, ts, rng)
    porter = _porter()
    P, S = porter.spunet_backbone(porter.SD(bsd))

    def paths(tree, prefix=""):
        if isinstance(tree, dict):
            out = set()
            for k, v in tree.items():
                out |= paths(v, f"{prefix}/{k}")
            return out
        return {f"{prefix}:{tuple(np.shape(tree))}"}

    assert paths(P) == paths(tp)
    assert paths(S) == paths(ts)
    # exact leaf mapping spot checks
    np.testing.assert_allclose(
        P["conv_input_weight"],
        np.transpose(
            bsd["conv_input.conv.weight"].reshape(8, 125, 6), (1, 2, 0)),
    )
    np.testing.assert_array_equal(
        S["enc0_block0_bn1"]["bns_0"]["mean"],
        bsd["enc.0.block0.bn1.bns.0.running_mean"],
    )
    # the ported tree runs
    out = net.apply({"params": P, "batch_stats": S}, d, train=False)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# ViT backbone branch (structural round-trip at vit_base scale)
# ---------------------------------------------------------------------------

def test_vit_backbone_branch(tmp_path):
    D_, P_, DEPTH_ = 768, 16, 12
    rng = np.random.RandomState(11)

    def t(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.02

    sd = {
        "patch_embed.proj.weight": t(D_, 3, P_, P_),
        "patch_embed.proj.bias": t(D_),
        "pos_embed": t(1, (224 // P_) ** 2 + 1, D_),
        "cls_token": t(1, 1, D_),
        "norm.weight": rng.rand(D_).astype(np.float32) + 0.5,
        "norm.bias": t(D_),
    }
    for i in range(DEPTH_):
        sd[f"blocks.{i}.norm1.weight"] = rng.rand(D_).astype(np.float32) + 0.5
        sd[f"blocks.{i}.norm1.bias"] = t(D_)
        sd[f"blocks.{i}.norm2.weight"] = rng.rand(D_).astype(np.float32) + 0.5
        sd[f"blocks.{i}.norm2.bias"] = t(D_)
        sd[f"blocks.{i}.attn.qkv.weight"] = t(3 * D_, D_)
        sd[f"blocks.{i}.attn.qkv.bias"] = t(3 * D_)
        sd[f"blocks.{i}.attn.proj.weight"] = t(D_, D_)
        sd[f"blocks.{i}.attn.proj.bias"] = t(D_)
        sd[f"blocks.{i}.mlp.fc1.weight"] = t(4 * D_, D_)
        sd[f"blocks.{i}.mlp.fc1.bias"] = t(4 * D_)
        sd[f"blocks.{i}.mlp.fc2.weight"] = t(D_, 4 * D_)
        sd[f"blocks.{i}.mlp.fc2.bias"] = t(D_)

    porter = _porter()
    P, S = porter.vit_backbone(porter.SD(sd))
    assert S == {}
    # the ported patch embedding maps exactly (OIHW -> HWIO)
    np.testing.assert_allclose(
        P["model"]["patch_embed_proj"]["kernel"],
        np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(P["model"]["pos_embed"], sd["pos_embed"])
    # every block landed
    assert all(f"blocks_{i}" in P["model"] for i in range(DEPTH_))


def test_r3m_style_resnet_backbone_branch():
    """Direct (non-Joiner) ResNet backbones with R3M's convnet. prefix route
    through the same loader."""
    rng = np.random.RandomState(13)
    sd = {f"convnet.{k}": v
          for k, v in _resnet18_state_dict(rng, in_ch=3).items()}
    porter = _porter()
    P = {}
    S = {}
    # run through the dispatch, not the helper, to cover branch selection
    full = porter.SD({f"backbone.{k}": v for k, v in sd.items()})
    bsd = full.sub("backbone")
    assert not any(k.startswith("0.body.") for k in bsd.keys())
    assert any(k.endswith("layer1.0.conv1.weight") for k in bsd.keys())
    conv1_key = next(
        k for k in bsd.keys() if k.endswith("conv1.weight")
        and "layer" not in k and "downsample" not in k
    )
    assert bsd[conv1_key].shape[1] == 3
    P, S = porter.resnet_backbone(bsd, 3)
    np.testing.assert_allclose(
        P["conv1"]["kernel"],
        np.transpose(sd["convnet.conv1.weight"], (2, 3, 1, 0)),
    )
    assert "layer1_0" in P and "bn1" in S


def test_dp_multi_image_obs_encoder_branch():
    """DP RGBD path: key_model_map.rgb (shared) routes to our rgb_model."""
    rng = np.random.RandomState(17)
    rsd = _resnet18_state_dict(rng, in_ch=4)
    sd = {f"obs_encoder.key_model_map.rgb.{k}": v for k, v in rsd.items()}
    porter = _porter()
    P, S = porter.port_multi_image_obs_encoder(porter.SD(sd))
    assert set(P) == {"rgb_model"} and set(S) == {"rgb_model"}
    np.testing.assert_allclose(
        P["rgb_model"]["conv1"]["kernel"],
        np.transpose(rsd["conv1.weight"], (2, 3, 1, 0)),
    )
    # per-key (unshared) models map to model_<key>
    sd2 = {f"obs_encoder.key_model_map.image.{k}": v for k, v in rsd.items()}
    P2, S2 = porter.port_multi_image_obs_encoder(porter.SD(sd2))
    assert set(P2) == {"model_image"}


def test_resnet_arch_inference_rejects_unknown_depth():
    """A non-18/34/50 block layout must raise, not silently drop blocks."""
    rng = np.random.RandomState(19)
    sd = _resnet18_state_dict(rng, in_ch=3)
    # graft an extra block into layer1 -> (3,2,2,2), not a torchvision layout
    for k in list(sd):
        if k.startswith("layer1.1."):
            sd[k.replace("layer1.1.", "layer1.2.")] = sd[k]
    porter = _porter()
    with pytest.raises(ValueError, match="unrecognized torchvision ResNet"):
        porter.resnet_backbone(porter.SD(sd), 3)


def test_vit_arch_inference_rejects_unknown_patch():
    rng = np.random.RandomState(23)
    sd = {"patch_embed.proj.weight": rng.randn(768, 3, 8, 8).astype(np.float32)}
    for i in range(12):
        sd[f"blocks.{i}.norm1.weight"] = rng.rand(768).astype(np.float32)
    porter = _porter()
    with pytest.raises(ValueError, match="unrecognized ViT"):
        porter.vit_backbone(porter.SD(sd))


def test_multivit_backbone_branch():
    """MultiMAE-style trunks route through load_torch_multimae_state_dict."""
    D_, DEPTH_ = 768, 12
    rng = np.random.RandomState(29)

    def t(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.02

    sd = {
        "global_tokens": t(1, 1, D_),
        "input_adapters.rgb.proj.weight": t(D_, 3, 16, 16),
        "input_adapters.rgb.proj.bias": t(D_),
        "input_adapters.depth.proj.weight": t(D_, 1, 16, 16),
        "input_adapters.depth.proj.bias": t(D_),
    }
    for i in range(DEPTH_):
        tp = f"encoder.{i}"
        sd[f"{tp}.norm1.weight"] = rng.rand(D_).astype(np.float32) + 0.5
        sd[f"{tp}.norm1.bias"] = t(D_)
        sd[f"{tp}.norm2.weight"] = rng.rand(D_).astype(np.float32) + 0.5
        sd[f"{tp}.norm2.bias"] = t(D_)
        sd[f"{tp}.attn.qkv.weight"] = t(3 * D_, D_)
        sd[f"{tp}.attn.qkv.bias"] = t(3 * D_)
        sd[f"{tp}.attn.proj.weight"] = t(D_, D_)
        sd[f"{tp}.attn.proj.bias"] = t(D_)
        sd[f"{tp}.mlp.fc1.weight"] = t(4 * D_, D_)
        sd[f"{tp}.mlp.fc1.bias"] = t(4 * D_)
        sd[f"{tp}.mlp.fc2.weight"] = t(D_, 4 * D_)
        sd[f"{tp}.mlp.fc2.bias"] = t(D_)

    porter = _porter()
    P, S = porter.multivit_backbone(porter.SD(sd))
    assert S == {}
    np.testing.assert_allclose(
        P["model"]["input_adapters_rgb"]["proj"]["kernel"],
        np.transpose(sd["input_adapters.rgb.proj.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(
        P["model"]["global_tokens"], sd["global_tokens"]
    )
    assert "encoder_11" in P["model"]

"""Make `/root/reference/src` importable on CPU torch for parity tests.

The reference's module tree imports GPU/simulator-only packages at module
scope (pointops CUDA extension, torchvision, lightning, hydra, spconv, ...).
The parity tests only exercise pure-torch numerics (ACT forward/loss, the
DETR transformer, ConditionalUnet1D + DDPM, LinearNormalizer, transformpcd,
rotation_conversions), so everything else is satisfied with minimal stubs.

Call ``install()`` before importing anything from ``src.``. Returns True if
the reference tree is present, else False (callers should skip).
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        # wire into parent package so `import a.b` then `a.b` attr works
        if "." in name:
            parent, child = name.rsplit(".", 1)
            if parent in sys.modules:
                setattr(sys.modules[parent], child, mod)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install() -> bool:
    import os

    if not os.path.isdir(REFERENCE_ROOT + "/src"):
        return False
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # our repo has its own `src/` entry-point package (train.py/validate.py);
    # evict any cached binding so `import src.*` resolves to the reference
    src_mod = sys.modules.get("src")
    if src_mod is not None and REFERENCE_ROOT not in (
        getattr(src_mod, "__file__", "") or ""
    ):
        for name in [n for n in sys.modules if n == "src" or n.startswith("src.")]:
            del sys.modules[name]
    # make absolutely sure the reference root wins the `src` resolution race
    sys.path.remove(REFERENCE_ROOT)
    sys.path.insert(0, REFERENCE_ROOT)

    import torch.nn as nn

    class _Anything:
        """Attribute sink for decorator-style uses (e.g. rank_zero_only)."""

        def __init__(self, *a, **k):
            pass

        def __call__(self, fn=None, *a, **k):
            return fn if callable(fn) else _Anything()

        def __getattr__(self, name):
            return _Anything()

    # ---- hydra / omegaconf glue --------------------------------------
    hydra = _stub("hydra")
    _stub("hydra.utils", instantiate=lambda *a, **k: None)
    _stub("hydra.core")
    _stub("hydra.core.hydra_config", HydraConfig=_Anything())
    hydra.utils = sys.modules["hydra.utils"]

    # the real omegaconf is installed in this image as a transitive dep of
    # nothing — stub defensively only if missing
    try:  # pragma: no cover
        import omegaconf  # noqa: F401
    except ImportError:  # pragma: no cover
        om = _stub("omegaconf")

        class DictConfig(dict):
            pass

        om.DictConfig = DictConfig
        om.ListConfig = list
        om.OmegaConf = _Anything()
        om.open_dict = _Anything()
        om.read_write = _Anything()
        om.MISSING = "???"
        _stub("omegaconf.errors", ConfigAttributeError=AttributeError)

    # ---- CUDA / simulator-only packages ------------------------------
    _stub("pointops")
    _stub("torch_scatter", scatter_softmax=None)
    _stub("torch_geometric")
    _stub("torch_geometric.utils", scatter=None)
    _stub("spconv")
    _stub("spconv.pytorch", SparseConvTensor=object, SubMConv3d=object,
          SparseConv3d=object, SparseInverseConv3d=object,
          SparseSequential=object, SparseModule=object)
    class _ZarrArray:  # isinstance() checks in tensor_util
        pass

    _stub("zarr", Array=_ZarrArray, Group=type("Group", (), {}))
    _stub("gdown")
    _stub("clip")

    # ---- lightning ----------------------------------------------------
    lightning = _stub(
        "lightning",
        LightningModule=nn.Module,
        LightningDataModule=object,
        Callback=object,
        Trainer=object,
        seed_everything=lambda *a, **k: None,
    )
    pl = _stub("lightning.pytorch", loggers=None, callbacks=None)
    _stub("lightning.pytorch.loggers", Logger=object, TensorBoardLogger=object,
          WandbLogger=object)
    _stub("lightning.pytorch.callbacks", Callback=object)
    _stub(
        "lightning.pytorch.utilities",
        rank_zero_only=_Anything(),
    )
    _stub("lightning.pytorch.utilities.rank_zero", rank_zero_only=_Anything())
    pl.LightningModule = nn.Module
    lightning.pytorch = pl
    _stub("lightning_utilities")
    _stub("lightning_utilities.core")
    _stub(
        "lightning_utilities.core.rank_zero",
        rank_zero_only=_Anything(),
        rank_prefixed_message=lambda msg, rank: msg,
    )

    # ---- torchvision / timm / diffusers / torchmetrics ----------------
    tv = _stub("torchvision")
    _stub("torchvision.models",
          _utils=types.SimpleNamespace(IntermediateLayerGetter=object))
    _stub("torchvision.models._utils", IntermediateLayerGetter=object)
    _stub("torchvision.ops")
    _stub("torchvision.ops.misc", FrozenBatchNorm2d=nn.Module)

    class _Normalize:
        def __init__(self, mean=None, std=None):
            self.mean, self.std = mean, std

        def __call__(self, x):
            import torch

            mean = torch.as_tensor(self.mean, dtype=x.dtype).view(-1, 1, 1)
            std = torch.as_tensor(self.std, dtype=x.dtype).view(-1, 1, 1)
            return (x - mean) / std

    class _ToTensor:
        def __call__(self, pic):
            import numpy as np
            import torch

            arr = np.asarray(pic, dtype=np.float32)
            if arr.ndim == 3:  # HWC -> CHW, [0,1]
                arr = arr.transpose(2, 0, 1) / 255.0
            return torch.from_numpy(arr)

    _stub("torchvision.transforms", Normalize=_Normalize, Compose=list,
          ToTensor=_ToTensor, functional=None)

    def _center_crop(img, output_size):
        import torch  # noqa: F401

        h, w = output_size
        H, W = img.shape[-2], img.shape[-1]
        top, left = (H - h) // 2, (W - w) // 2
        return img[..., top:top + h, left:left + w]

    _stub("torchvision.transforms.functional", center_crop=_center_crop)
    tv.transforms = sys.modules["torchvision.transforms"]

    try:  # pragma: no cover
        import timm  # noqa: F401
    except ImportError:
        _stub("timm")
        _stub("timm.models")
        _stub("timm.models.layers", DropPath=nn.Identity, to_2tuple=None,
              trunc_normal_=lambda *a, **k: None)
        _stub("timm.models.vision_transformer", Block=nn.Module,
              PatchEmbed=nn.Module, resize_pos_embed=lambda *a, **k: None,
              VisionTransformer=nn.Module)
        _stub("timm.scheduler")
        _stub("timm.scheduler.scheduler", Scheduler=object)

    try:  # pragma: no cover
        import torchmetrics  # noqa: F401
    except ImportError:
        _stub("torchmetrics", Metric=nn.Module, MeanMetric=nn.Module,
              MaxMetric=nn.Module, MinMetric=nn.Module)

    try:  # pragma: no cover
        import diffusers  # noqa: F401
    except ImportError:
        _stub("diffusers", DDPMScheduler=object)
        _stub("diffusers.schedulers")
        _stub("diffusers.schedulers.scheduling_ddpm", DDPMScheduler=object)

    try:  # pragma: no cover
        import rich  # noqa: F401
    except ImportError:  # pragma: no cover
        _stub("rich", print=print)
        _stub("rich.prompt", Prompt=_Anything())
        _stub("rich.syntax", Syntax=_Anything())
        _stub("rich.tree", Tree=_Anything())

    try:  # pragma: no cover
        import h5py  # noqa: F401
    except ImportError:  # pragma: no cover
        _stub("h5py", File=_Anything())

    return True


def install_pointops_adapters() -> None:
    """Back the ``pointops`` stub with our packed-offset implementations.

    The reference's CUDA kernels can't run here; routing its pointops calls
    through our packed wrappers (`pointcloudmatters_tpu/ops/pointops.py`,
    themselves oracle-tested in test_pointops.py) lets the reference ACTPCD
    forward execute on CPU so everything *downstream* of FPS/kNN is parity-
    checked against the reference implementation.
    """
    import numpy as np
    import torch

    from pointcloudmatters_tpu.ops import pointops as po

    stub = sys.modules["pointops"]

    def farthest_point_sampling(p, o, n_o):
        idx = po.farthest_point_sampling(
            np.asarray(p.detach()), np.asarray(o.detach()), np.asarray(n_o.detach())
        )
        return torch.from_numpy(np.asarray(idx)).to(torch.int64)

    def knn_query_and_group(x, p, offset=None, new_xyz=None, new_offset=None,
                            idx=None, nsample=None, with_xyz=False):
        grouped, idx_out = po.knn_query_and_group(
            np.asarray(x.detach()), np.asarray(p.detach()),
            offset=np.asarray(offset.detach()) if offset is not None else None,
            new_xyz=np.asarray(new_xyz.detach()) if new_xyz is not None else None,
            new_offset=(
                np.asarray(new_offset.detach()) if new_offset is not None else None
            ),
            idx=np.asarray(idx.detach()) if idx is not None else None,
            nsample=nsample, with_xyz=with_xyz,
        )
        return (
            torch.from_numpy(np.asarray(grouped, np.float32)),
            torch.from_numpy(np.asarray(idx_out)),
        )

    def knn_query(nsample, xyz, offset, new_xyz=None, new_offset=None):
        idx, dist = po.knn_query(
            nsample, np.asarray(xyz.detach()), np.asarray(offset.detach()),
            np.asarray(new_xyz.detach()) if new_xyz is not None else None,
            np.asarray(new_offset.detach()) if new_offset is not None else None,
        )
        return torch.from_numpy(idx), torch.from_numpy(dist)

    stub.farthest_point_sampling = farthest_point_sampling
    stub.knn_query_and_group = knn_query_and_group
    stub.knn_query = knn_query


def install_pointops_autograd() -> None:
    """Like ``install_pointops_adapters`` but with a torch-autograd
    ``knn_query_and_group``: neighbor *indices* come from our oracle-tested
    kNN (indices carry no gradient anyway), while the gather + relative-xyz
    concat runs in differentiable torch ops with the reference's
    ``sign(idx+1)`` hole masking (`functions/grouping.py:35-59`). Needed by
    the training-trajectory parity test, where gradients must flow through
    the grouped features into the backbone."""
    import torch

    install_pointops_adapters()
    stub = sys.modules["pointops"]
    knn_query = stub.knn_query

    def knn_query_and_group(x, p, offset=None, new_xyz=None, new_offset=None,
                            idx=None, nsample=None, with_xyz=False):
        if new_xyz is None:
            new_xyz = p
        if idx is None:
            idx, _ = knn_query(nsample, p, offset, new_xyz, new_offset)
        keep = torch.sign(idx + 1).to(x.dtype).unsqueeze(-1)
        safe = idx.clamp(min=0).long()
        gf = x[safe] * keep  # (m, k, c), autograd through x
        if with_xyz:
            gx = (p[safe] - new_xyz.unsqueeze(1)) * keep
            return torch.cat([gx, gf], dim=-1), idx
        return gf, idx

    stub.knn_query_and_group = knn_query_and_group

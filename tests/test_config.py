"""Tests for the Hydra-compatible config engine (compose / overrides / instantiate)."""

import os

import pytest

from pointcloudmatters_tpu.utils import config as C


def test_compose_root_defaults(config_dir):
    cfg = C.compose(config_dir, "train", [])
    assert cfg.task_name == "train"
    assert cfg.seed == 1000
    assert cfg.trainer.strategy == "data_parallel"  # trainer: ddp default
    assert cfg.trainer.max_epochs == 10  # inherited from trainer/default.yaml
    assert cfg.callbacks.model_checkpoint.save_top_k == 3  # default.yaml override
    assert cfg.callbacks.early_stopping.patience == 100
    assert "data" not in cfg or not cfg.get("data")  # group unselected


def test_group_choice_override(config_dir):
    cfg = C.compose(config_dir, "train", ["trainer=cpu"])
    assert cfg.trainer.accelerator == "cpu"
    assert cfg.trainer.precision == "32-true"
    assert cfg.trainer.max_epochs == 10


def test_value_overrides(config_dir):
    cfg = C.compose(
        config_dir,
        "train",
        ["trainer.max_epochs=20", "seed=300", "+some_new_param=some_new_value",
         "tags=[a, b]"],
    )
    assert cfg.trainer.max_epochs == 20
    assert cfg.seed == 300
    assert cfg.some_new_param == "some_new_value"
    assert cfg.tags == ["a", "b"]


def test_debug_overlay_is_global(config_dir):
    cfg = C.compose(config_dir, "train", ["debug=default"])
    assert cfg.task_name == "debug"
    assert cfg.trainer.detect_anomaly is True
    assert cfg.trainer.limit_train_batches == 2


def test_debug_fdr_inherits_default(config_dir):
    cfg = C.compose(config_dir, "train", ["debug=fdr"])
    assert cfg.task_name == "debug"
    assert cfg.trainer.fast_dev_run is True


def test_delete_override(config_dir):
    cfg = C.compose(config_dir, "train", ["~callbacks.early_stopping"])
    assert "early_stopping" not in cfg.callbacks


def test_interpolation_and_resolvers(config_dir, tmp_path):
    C.set_runtime(output_dir=str(tmp_path), cwd=os.getcwd())
    os.environ["PROJECT_ROOT"] = str(tmp_path)
    cfg = C.compose(config_dir, "train", [])
    C.resolve_config(cfg)
    assert cfg.paths.root_dir == str(tmp_path)
    assert cfg.paths.log_dir == f"{tmp_path}/logs/"
    assert cfg.paths.output_dir == str(tmp_path)
    assert cfg.callbacks.model_checkpoint.dirpath == f"{tmp_path}/checkpoints"


def test_eval_resolver():
    cfg = C.DotDict({"hidden": 512, "half": "${eval:'${hidden} // 2'}"})
    C.resolve_config(cfg)
    assert cfg.half == 256


def test_nested_interpolation_chain():
    cfg = C.DotDict({
        "model": {"optimizer": {"lr": 5e-5},
                  "sched": {"max_lr": "${model.optimizer.lr}"}},
    })
    C.resolve_config(cfg)
    assert cfg.model.sched.max_lr == 5e-5


def test_instantiate_target():
    cfg = C.DotDict({
        "_target_": "collections.OrderedDict",
        "a": 1,
        "b": {"_target_": "fractions.Fraction", "numerator": 1, "denominator": 2},
    })
    obj = C.instantiate(cfg)
    assert obj["a"] == 1
    assert float(obj["b"]) == 0.5


def test_instantiate_partial():
    cfg = C.DotDict({"_target_": "fractions.Fraction", "_partial_": True,
                     "denominator": 4})
    fn = C.instantiate(cfg)
    assert float(fn(numerator=3)) == 0.75


def test_missing_mandatory_value():
    cfg = C.DotDict({"x": "???"})
    with pytest.raises(C.MissingMandatoryValue):
        _ = cfg.x


def test_exp_overlay_style(tmp_path):
    """A miniature exp_*/base.yaml tree exercising override-directives + subgroups."""
    cdir = tmp_path / "configs"
    (cdir / "model").mkdir(parents=True)
    (cdir / "exp" / "sub").mkdir(parents=True)
    (cdir / "train.yaml").write_text(
        "# @package _global_\ndefaults:\n  - _self_\n  - model:\n  - exp:\nroot_key: 1\n"
    )
    (cdir / "model" / "a.yaml").write_text("name: a\nlr: 0.1\n")
    (cdir / "model" / "b.yaml").write_text("name: b\nlr: 0.2\n")
    (cdir / "exp" / "base.yaml").write_text(
        "# @package _global_\ndefaults:\n  - sub:\n  - override /model: a\n"
        "model:\n  tweaked: true\n"
    )
    (cdir / "exp" / "sub" / "x.yaml").write_text(
        "# @package _global_\nmodel:\n  name: x-overlay\n"
    )
    cfg = C.compose(str(cdir), "train", ["exp=base"])
    assert cfg.model.lr == 0.1
    assert cfg.model.tweaked is True

    cfg = C.compose(str(cdir), "train", ["exp=base", "exp/sub@sub=x", "model=b"])
    # CLI model=b beats the overlay's `override /model: a`
    assert cfg.model.lr == 0.2
    # subgroup overlay applied before exp content
    assert cfg.model.name == "x-overlay"

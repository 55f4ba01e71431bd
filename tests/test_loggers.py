"""Logger backend behavior (utils/loggers.py)."""

from __future__ import annotations


def test_offline_backend_logger_records_schema(tmp_path):
    import json

    from pointcloudmatters_tpu.utils.loggers import WandbLogger

    lg = WandbLogger(save_dir=str(tmp_path), project="p", offline=True,
                     tags=["a"], id=None)
    lg.log_metrics({"train/loss": 1.5}, 3)
    lg.finalize()
    cfg = json.load(open(tmp_path / "wandb" / "backend_config.json"))
    assert cfg["backend"] == "wandb"
    assert cfg["project"] == "p" and cfg["tags"] == ["a"]
    assert (tmp_path / "wandb" / "metrics.csv").exists()

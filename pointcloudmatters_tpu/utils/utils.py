"""Run-lifecycle helpers (reference `src/utils/utils.py:14,45,100`,
`instantiators.py`, `logging_utils.py`, `rich_utils.py`)."""

from __future__ import annotations

import functools
import os
import random
import warnings
from typing import Any, Callable, Optional

import numpy as np

from pointcloudmatters_tpu.utils import config as config_engine
from pointcloudmatters_tpu.utils.pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)


def seed_everything(seed: int) -> None:
    """Seed python/numpy; JAX PRNG keys are derived explicitly from the same
    seed by the task modules (functional randomness, no global jax state)."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ["PYTHONHASHSEED"] = str(seed)


def print_config_tree(cfg: dict, indent: int = 0) -> None:
    """Plain-text config tree (the reference prints a rich tree,
    `rich_utils.py:20`)."""
    pad = "  " * indent
    for key, value in dict.items(cfg) if isinstance(cfg, dict) else []:
        if isinstance(value, dict):
            print(f"{pad}{key}:")
            print_config_tree(value, indent + 1)
        else:
            print(f"{pad}{key}: {value}")


def extras(cfg: dict) -> None:
    """Pre-run niceties: warnings filter, tag enforcement, config tree
    (reference `utils.py:14-42`)."""
    ex = cfg.get("extras") or {}
    if ex.get("ignore_warnings"):
        warnings.filterwarnings("ignore")
    if ex.get("enforce_tags") and not cfg.get("tags"):
        raise ValueError("Specify tags before launching (enforce_tags=true)")
    if ex.get("print_config", True):
        print_config_tree(cfg)


def task_wrapper(task_func: Callable) -> Callable:
    """Exception-logging wrapper (reference `utils.py:45-97`): always logs the
    output dir, re-raises failures so multiruns surface them."""

    @functools.wraps(task_func)
    def wrap(cfg: dict):
        try:
            metric_dict, object_dict = task_func(cfg)
        except Exception as ex:
            log.exception("task failed")
            raise ex
        finally:
            out = config_engine.select(cfg, "paths.output_dir")
            log.info(f"Output dir: {out}")
        return metric_dict, object_dict

    return wrap


def get_metric_value(metric_dict: dict, metric_name: Optional[str]):
    """Fetch the hydra-sweep optimization metric (reference `utils.py:100`)."""
    if not metric_name:
        return None
    if metric_name not in metric_dict:
        raise KeyError(
            f"Metric '{metric_name}' not found in {sorted(metric_dict)}"
        )
    return float(metric_dict[metric_name])


def instantiate_callbacks(callbacks_cfg: Any) -> list:
    """(reference `instantiators.py:15`)"""
    callbacks = []
    if not callbacks_cfg:
        return callbacks
    for name, cb_conf in dict.items(callbacks_cfg):
        if isinstance(cb_conf, dict) and "_target_" in cb_conf:
            log.info(f"Instantiating callback <{cb_conf['_target_']}>")
            callbacks.append(config_engine.instantiate(cb_conf))
    return callbacks


def instantiate_loggers(logger_cfg: Any) -> list:
    """(reference `instantiators.py:38`)"""
    loggers = []
    if not logger_cfg:
        return loggers
    for name, lg_conf in dict.items(logger_cfg):
        if isinstance(lg_conf, dict) and "_target_" in lg_conf:
            log.info(f"Instantiating logger <{lg_conf['_target_']}>")
            loggers.append(config_engine.instantiate(lg_conf))
    return loggers


def log_hyperparameters(object_dict: dict) -> None:
    """Push the composed config + param counts to every logger
    (reference `logging_utils.py:14`)."""
    cfg = object_dict.get("cfg", {})
    trainer = object_dict.get("trainer")
    model = object_dict.get("model")
    if trainer is None or not getattr(trainer, "logger", None):
        return
    hparams = {k: config_engine.to_container(v) if isinstance(v, dict) else v
               for k, v in dict.items(cfg)}
    if model is not None and getattr(trainer, "state", None) is not None:
        import jax

        params = trainer.state.params
        hparams["model/params/total"] = sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(params)
        )
    trainer.logger.log_hyperparams(hparams)

"""Optimizer builders on optax.

Config-schema parity with the reference registry builders
(`src/utils/optimizer.py:19-21,33-72,272-321`): ``{"type": "AdamW", "lr": ...,
"weight_decay": ...}`` dicts plus keyword-matched param groups
(``param_dicts=[{"keyword": ..., "lr": ...}]``). Torch semantics are matched:

- SGD / Adam apply *coupled* L2 (weight decay added to the gradient before
  the moment updates); AdamW applies decoupled decay scaled by lr
- ``param_dicts`` keyword matching walks flattened parameter paths
  (``a/b/kernel``), first match wins, unmatched params fall into group 0 —
  same dispatch as the reference's ``named_parameters`` loop

The learning rate may be a float or an optax schedule (see
``scheduler.build_scheduler``); torch mutates optimizer lr via an attached
scheduler object, here the schedule is compiled into the update.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import jax
import optax

from pointcloudmatters_tpu.utils.pylogger import RankedLogger
from pointcloudmatters_tpu.utils.registry import Registry

log = RankedLogger(__name__, rank_zero_only=True)

OPTIMIZERS = Registry("optimizers")

ScalarOrSchedule = Union[float, Callable[[Any], Any]]


@OPTIMIZERS.register_module(name="SGD")
def sgd(
    lr: ScalarOrSchedule,
    momentum: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    dampening: float = 0.0,
) -> optax.GradientTransformation:
    del dampening  # torch default 0; nonzero unsupported
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))  # coupled L2
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


@OPTIMIZERS.register_module(name="Adam")
def adam(
    lr: ScalarOrSchedule,
    betas: Sequence[float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))  # coupled L2
    parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


@OPTIMIZERS.register_module(name="AdamW")
def adamw(
    lr: ScalarOrSchedule,
    betas: Sequence[float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps,
        weight_decay=weight_decay,
    )


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def build_optimizer(
    cfg: dict,
    params: Any = None,
    param_dicts: Optional[Sequence[dict]] = None,
    lr_schedule: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """Build an optax optimizer from a ``{"type": ...}`` config.

    Args:
        cfg: optimizer config (``type``, ``lr``, optimizer kwargs).
        params: parameter pytree; required when ``param_dicts`` is given.
        param_dicts: optional keyword-matched overrides, each
            ``{"keyword": str, "lr"?: float, "weight_decay"?: float, ...}``
            (reference `optimizer.py:33-72`).
        lr_schedule: optional schedule mapping step -> *factor*; the effective
            lr is ``group_lr * factor`` each step. Schedules built by
            ``build_scheduler`` return absolute lrs for the base group and are
            rescaled per group here.
    """
    cfg = dict(cfg)
    opt_type = cfg.pop("type")
    if OPTIMIZERS.get(opt_type) is None:
        raise KeyError(f"{opt_type} is not in the optimizers registry")
    base_lr = float(cfg.pop("lr"))

    def make(lr_value: float, extra: dict) -> optax.GradientTransformation:
        kwargs = dict(cfg)
        kwargs.update(
            {k: v for k, v in extra.items() if k not in ("keyword", "lr")}
        )
        if lr_schedule is not None:
            scale = lr_value / base_lr if base_lr else 1.0
            lr: ScalarOrSchedule = (
                lr_schedule if scale == 1.0
                else (lambda step, s=scale: lr_schedule(step) * s)
            )
        else:
            lr = lr_value
        return OPTIMIZERS.get(opt_type)(lr=lr, **kwargs)

    if not param_dicts:
        return make(base_lr, {})

    if params is None:
        raise ValueError("params pytree required when param_dicts is used")

    groups = [make(base_lr, {})] + [
        make(float(pd.get("lr", base_lr)), dict(pd)) for pd in param_dicts
    ]

    flat = jax.tree_util.tree_leaves_with_path(params)
    assignment: dict[str, int] = {}
    for path, _ in flat:
        name = _path_str(path)
        label = 0
        for i, pd in enumerate(param_dicts):
            if pd["keyword"] in name:
                label = i + 1
                break
        assignment[name] = label
    for i in range(len(groups)):
        members = [n for n, g in assignment.items() if g == i]
        log.info(f"Params Group {i} ({len(members)} tensors): {members[:8]}...")

    def label_fn(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: assignment.get(_path_str(path), 0), tree
        )

    return optax.multi_transform(
        {i: g for i, g in enumerate(groups)}, label_fn
    )

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
import jax.numpy as jnp
import optax

from pointcloudmatters_tpu.utils.pylogger import RankedLogger
from pointcloudmatters_tpu.utils.registry import Registry

log = RankedLogger(__name__, rank_zero_only=True)

OPTIMIZERS = Registry("optimizers")

ScalarOrSchedule = Union[float, Callable[[Any], Any]]


def scale_by_adam_b1_schedule(
    b1_schedule: Callable[[Any], Any],
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with a per-step beta1 (torch OneCycleLR
    ``cycle_momentum=True`` semantics: the scheduler mutates the optimizer's
    beta1 before each step, and torch's bias correction uses the *current*
    beta1 — ``1 - beta1_t ** step`` — not the product of historical betas).

    State is ``optax.ScaleByAdamState`` (count, mu, nu), structurally
    identical to ``scale_by_adam``'s, so checkpoints swap between cycled and
    fixed-beta1 optimizers without tree surgery.
    """

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        # the lr schedule convention here is schedule(steps_completed); use
        # the same index for beta1 so step t sees the value torch's
        # scheduler installed before optimizer.step() number t
        b1 = b1_schedule(state.count)
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * (g * g),
                          state.nu, updates)
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree.map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu, nu
        )
        return new_updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


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
    b1_schedule: Optional[Callable] = None,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))  # coupled L2
    if b1_schedule is not None:
        parts.append(scale_by_adam_b1_schedule(b1_schedule, b2=betas[1], eps=eps))
    else:
        parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


@OPTIMIZERS.register_module(name="AdamW")
def adamw(
    lr: ScalarOrSchedule,
    betas: Sequence[float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    b1_schedule: Optional[Callable] = None,
) -> optax.GradientTransformation:
    if b1_schedule is not None:
        # same chain optax.adamw compiles to, with the cycled-beta1 core;
        # state tree stays (ScaleByAdamState, EmptyState, schedule state)
        return optax.chain(
            scale_by_adam_b1_schedule(b1_schedule, b2=betas[1], eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(lr),
        )
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
    b1_schedule: Optional[Callable] = None,
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
        b1_schedule: optional step -> beta1 schedule (OneCycleLR momentum
            cycling, ``scheduler.build_momentum_schedule``); Adam/AdamW only.
    """
    cfg = dict(cfg)
    opt_type = cfg.pop("type")
    if OPTIMIZERS.get(opt_type) is None:
        raise KeyError(f"{opt_type} is not in the optimizers registry")
    base_lr = float(cfg.pop("lr"))
    if b1_schedule is not None and opt_type not in ("Adam", "AdamW"):
        log.warning(
            f"b1_schedule (OneCycleLR momentum cycling) is modeled for "
            f"Adam/AdamW only; {opt_type} keeps its configured momentum."
        )
        b1_schedule = None

    def make(lr_value: float, extra: dict) -> optax.GradientTransformation:
        kwargs = dict(cfg)
        kwargs.update(
            {k: v for k, v in extra.items() if k not in ("keyword", "lr")}
        )
        if b1_schedule is not None:
            kwargs["b1_schedule"] = b1_schedule
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


# ---------------------------------------------------------------------------
# timm-style grouping (reference `optimizer.py:205-321`)
# ---------------------------------------------------------------------------

def param_groups_weight_decay(params: Any, weight_decay: float,
                              no_weight_decay_list: Sequence[str] = ()):
    """Mask: 1-D params (biases, norms) and listed names get no decay
    (reference `param_groups_weight_decay`)."""
    no_decay = set(no_weight_decay_list)

    def decay_flag(path, p):
        name = _path_str(path)
        return not (np.ndim(p) <= 1 or name in no_decay)

    import numpy as np  # local to keep module import light

    return jax.tree_util.tree_map_with_path(decay_flag, params)


def _layer_id_from_path(name: str, num_layers: int) -> int:
    """Heuristic trunk grouping: embedding-ish params -> 0, numbered blocks ->
    1 + index, heads/unmatched -> num_layers (reference ``_layer_map``)."""
    import re

    if any(k in name for k in ("patch_embed", "cls_token", "pos_embed",
                               "embedding", "conv_input", "conv1/")):
        return 0
    m = re.search(r"(?:blocks?|layers?|encoder)[._/]?(\d+)", name)
    if m:
        return min(1 + int(m.group(1)), num_layers - 1)
    return num_layers - 1


def param_groups_layer_decay(params: Any, weight_decay: float = 0.05,
                             layer_decay: float = 0.75,
                             no_weight_decay_list: Sequence[str] = (),
                             num_layers: int = 14):
    """(scale_tree, decay_mask_tree) for BEiT-style layer-wise lr decay
    (reference `optimizer.py:205-270`)."""
    import numpy as np

    no_decay = set(no_weight_decay_list)
    flat = jax.tree_util.tree_leaves_with_path(params)
    max_layer = max(
        (_layer_id_from_path(_path_str(p), num_layers) for p, _ in flat),
        default=0,
    )

    def scale(path, p):
        lid = _layer_id_from_path(_path_str(path), num_layers)
        return float(layer_decay ** (max_layer - lid))

    def decay_flag(path, p):
        name = _path_str(path)
        return not (np.ndim(p) <= 1 or name in no_decay)

    scales = jax.tree_util.tree_map_with_path(scale, params)
    mask = jax.tree_util.tree_map_with_path(decay_flag, params)
    return scales, mask


def build_optimizer_v2(
    cfg: dict,
    params: Any,
    weight_decay: float = 0.0,
    lr_schedule: Optional[Callable] = None,
    **kwargs,
) -> optax.GradientTransformation:
    """timm-style builder (reference `optimizer.py:272-321`): optional
    layer-wise lr decay and bias/norm weight-decay filtering, expressed as
    optax masks and a per-leaf lr-scale transform."""
    cfg = dict(cfg)
    opt_type = cfg.pop("type")
    layer_decay = cfg.pop("layer_decay", None)
    filter_bias_and_bn = cfg.pop("filter_bias_and_bn", True)
    cfg.pop("foreach", None)
    wd = float(cfg.pop("weight_decay", weight_decay) or 0.0)
    base_lr = float(cfg.pop("lr"))
    kwargs = {**cfg, **kwargs}

    lr: ScalarOrSchedule = lr_schedule if lr_schedule is not None else base_lr

    decay_mask = None
    if wd and filter_bias_and_bn:
        decay_mask = param_groups_weight_decay(params, wd)

    scales = None
    if layer_decay is not None:
        scales, decay_mask = param_groups_layer_decay(
            params, weight_decay=wd, layer_decay=float(layer_decay)
        )

    name = opt_type if isinstance(opt_type, str) else opt_type.__name__
    if name.lower() == "adamw":
        tx = optax.adamw(
            learning_rate=lr,
            b1=kwargs.get("betas", (0.9, 0.999))[0],
            b2=kwargs.get("betas", (0.9, 0.999))[1],
            eps=kwargs.get("eps", 1e-8),
            weight_decay=wd,
            mask=decay_mask,
        )
    else:
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd, mask=decay_mask))
        if name.lower() == "sgd":
            if kwargs.get("momentum"):
                parts.append(optax.trace(decay=kwargs["momentum"],
                                         nesterov=kwargs.get("nesterov", False)))
        elif name.lower() == "adam":
            betas = kwargs.get("betas", (0.9, 0.999))
            parts.append(optax.scale_by_adam(
                b1=betas[0], b2=betas[1], eps=kwargs.get("eps", 1e-8)
            ))
        else:
            raise KeyError(f"{name} is not in the optimizers registry")
        parts.append(optax.scale_by_learning_rate(lr))
        tx = optax.chain(*parts)

    if scales is not None:
        # per-leaf lr scaling: multiply updates by the layer scale
        def scale_updates(updates, state, params=None):
            return jax.tree.map(lambda u, s: u * s, updates, scales), state

        tx = optax.chain(
            tx, optax.GradientTransformation(lambda _: (), scale_updates)
        )
    return tx

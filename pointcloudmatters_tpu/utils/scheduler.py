"""Learning-rate schedules as optax-style callables.

Registry parity with the reference torch schedulers
(`src/utils/scheduler.py:9-143`): every schedule is re-parameterized by
``total_steps`` injected by the trainer from its estimated stepping batches
(reference `maniskill2_act_bc_module.py:352-354`). Schedules return the
*absolute* lr per step (``base_lr`` times the reference's multiplicative
factor), so they drop straight into optax optimizers; jnp ops keep them
jit-compatible inside the update.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import optax

from pointcloudmatters_tpu.utils.registry import Registry

SCHEDULERS = Registry("schedulers")

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


@SCHEDULERS.register_module(name="MultiStepLR")
def multi_step_lr(
    base_lr: float, total_steps: int, milestones: Sequence[float], gamma: float = 0.1
) -> Schedule:
    bounds = jnp.asarray([rate * total_steps for rate in milestones])

    def schedule(step):
        passed = jnp.sum(step >= bounds)
        return base_lr * gamma ** passed

    return schedule


@SCHEDULERS.register_module(name="MultiStepWithWarmupLR")
def multi_step_with_warmup_lr(
    base_lr: float,
    total_steps: int,
    milestones: Sequence[float],
    gamma: float = 0.1,
    warmup_rate: float = 0.05,
    warmup_scale: float = 1e-6,
) -> Schedule:
    bounds = jnp.asarray([rate * total_steps for rate in milestones])
    warmup_steps = warmup_rate * total_steps

    def schedule(step):
        factor = gamma ** jnp.sum(step >= bounds)
        warm = 1 - (1 - step / warmup_steps) * (1 - warmup_scale)
        coeff = jnp.where(step <= warmup_steps, warm, 1.0)
        return base_lr * coeff * factor

    return schedule


@SCHEDULERS.register_module(name="PolyLR")
def poly_lr(base_lr: float, total_steps: int, power: float = 0.9) -> Schedule:
    def schedule(step):
        return base_lr * (1 - step / (total_steps + 1)) ** power

    return schedule


@SCHEDULERS.register_module(name="ExpLR")
def exp_lr(base_lr: float, total_steps: int, gamma: float = 0.9) -> Schedule:
    def schedule(step):
        return base_lr * gamma ** (step / total_steps)

    return schedule


@SCHEDULERS.register_module(name="CosineAnnealingLR")
def cosine_annealing_lr(
    base_lr: float, total_steps: int, eta_min: float = 0.0
) -> Schedule:
    def schedule(step):
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1 + jnp.cos(math.pi * step / total_steps)
        )

    return schedule


@SCHEDULERS.register_module(name="OneCycleLR")
def one_cycle_lr(
    base_lr: float,
    total_steps: int,
    max_lr: float | None = None,
    pct_start: float = 0.3,
    anneal_strategy: str = "cos",
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
    cycle_momentum: bool = True,
    base_momentum: float = 0.85,
    max_momentum: float = 0.95,
    three_phase: bool = False,
) -> Schedule:
    """torch ``OneCycleLR`` semantics: initial = max/div, final =
    initial/final_div, cosine ramp up for ``pct_start`` then anneal.

    ``cycle_momentum`` (torch default True) is modeled as a *companion*
    schedule — see ``build_momentum_schedule`` — which the optimizer builder
    compiles into Adam's beta1 (torch cycles beta1 ``max_momentum`` ->
    ``base_momentum`` during warmup and back during the anneal, inverse to
    the LR). The LR schedule itself ignores the momentum kwargs.
    """
    del cycle_momentum, base_momentum, max_momentum  # see build_momentum_schedule
    if three_phase:
        raise NotImplementedError("three_phase OneCycleLR")
    if anneal_strategy != "cos":
        raise NotImplementedError(f"anneal_strategy={anneal_strategy!r}")
    peak = float(max_lr if max_lr is not None else base_lr)
    # exact torch step indexing (torch OneCycleLR._get_lr): warmup anneals
    # over pct_start*T - 1 intervals (peak reached AT step pct*T-1), the
    # down phase over the remaining intervals with the floor reached AT the
    # final step T-1. optax.cosine_onecycle_schedule shifts both boundaries
    # by one step — enough to visibly split loss trajectories from the torch
    # reference within 3 optimizer steps (test_reference_parity
    # TestTrainingTrajectoryParity). Degenerate totals (1-2 step debug runs)
    # are handled by clamping each phase to span >= 1 interval.
    initial = peak / div_factor
    floor = initial / final_div_factor
    e1 = max(pct_start * float(total_steps) - 1.0, 1.0)
    e2 = max(float(total_steps) - 1.0, e1 + 1.0)

    def _anneal_cos(start: float, end: float, pct: jnp.ndarray) -> jnp.ndarray:
        return end + (start - end) / 2.0 * (jnp.cos(jnp.pi * pct) + 1.0)

    def schedule(count) -> jnp.ndarray:
        s = jnp.asarray(count, jnp.float32)
        lr_up = _anneal_cos(initial, peak, jnp.clip(s / e1, 0.0, 1.0))
        lr_down = _anneal_cos(
            peak, floor, jnp.clip((s - e1) / (e2 - e1), 0.0, 1.0)
        )
        return jnp.where(s <= e1, lr_up, lr_down)

    return schedule


def build_momentum_schedule(cfg: dict, total_steps: int) -> Optional[Schedule]:
    """Companion beta1/momentum schedule for ``OneCycleLR`` with
    ``cycle_momentum=True`` (the torch default): beta1 anneals
    ``max_momentum`` -> ``base_momentum`` over the warmup phase and back to
    ``max_momentum`` over the anneal phase, with the SAME cosine shape and
    step indexing as the LR (torch ``OneCycleLR.__init__`` momentum phases).
    Returns ``None`` for every other scheduler type or when
    ``cycle_momentum=False``.
    """
    cfg = dict(cfg)
    if cfg.get("type") != "OneCycleLR":
        return None
    if not cfg.get("cycle_momentum", True):
        return None
    if cfg.get("anneal_strategy", "cos") != "cos":
        raise NotImplementedError("anneal_strategy != 'cos'")
    pct_start = float(cfg.get("pct_start", 0.3))
    base_m = float(cfg.get("base_momentum", 0.85))
    max_m = float(cfg.get("max_momentum", 0.95))
    # identical phase boundaries to one_cycle_lr above
    e1 = max(pct_start * float(total_steps) - 1.0, 1.0)
    e2 = max(float(total_steps) - 1.0, e1 + 1.0)

    def _anneal_cos(start: float, end: float, pct: jnp.ndarray) -> jnp.ndarray:
        return end + (start - end) / 2.0 * (jnp.cos(jnp.pi * pct) + 1.0)

    def schedule(count) -> jnp.ndarray:
        s = jnp.asarray(count, jnp.float32)
        m_up = _anneal_cos(max_m, base_m, jnp.clip(s / e1, 0.0, 1.0))
        m_down = _anneal_cos(
            base_m, max_m, jnp.clip((s - e1) / (e2 - e1), 0.0, 1.0)
        )
        return jnp.where(s <= e1, m_up, m_down)

    return schedule


def build_scheduler(cfg: dict, total_steps: int, base_lr: float) -> Schedule:
    """Build a schedule from a ``{"type": ...}`` config, injecting
    ``total_steps`` and the optimizer's base lr (reference
    `scheduler.py:139-143` + the task modules' total_steps injection)."""
    cfg = dict(cfg)
    sched_type = cfg.pop("type")
    cfg.pop("total_steps", None)
    cfg.pop("interval", None)
    cfg.pop("frequency", None)
    return SCHEDULERS.get(sched_type)(
        base_lr=base_lr, total_steps=total_steps, **cfg
    )


@SCHEDULERS.register_module(name="CosineLRScheduler")
def cosine_lr_scheduler(
    base_lr: float,
    total_steps: int,
    t_initial: Optional[int] = None,
    lr_min: float = 0.0,
    cycle_mul: float = 1.0,
    cycle_decay: float = 1.0,
    cycle_limit: int = 1,
    warmup_t: int = 0,
    warmup_lr_init: float = 0.0,
    warmup_prefix: bool = False,
    k_decay: float = 1.0,
) -> Schedule:
    """timm ``CosineLRScheduler`` semantics (reference
    `utils/scheduler_timm.py:156`): linear warmup then cosine cycles with
    per-cycle decay. Single-cycle fast path == optax warmup-cosine."""
    t_initial = int(t_initial or total_steps)
    if cycle_mul == 1.0 and cycle_limit == 1 and k_decay == 1.0:
        return optax.warmup_cosine_decay_schedule(
            init_value=warmup_lr_init, peak_value=base_lr,
            warmup_steps=max(warmup_t, 0),
            decay_steps=t_initial + (warmup_t if warmup_prefix else 0),
            end_value=lr_min,
        )

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        in_warmup = t < warmup_t
        warm = warmup_lr_init + (base_lr - warmup_lr_init) * t / jnp.maximum(warmup_t, 1)
        tt = jnp.where(warmup_prefix, t - warmup_t, t)
        # locate the cycle (geometric lengths when cycle_mul != 1)
        if cycle_mul == 1.0:
            i = jnp.floor(tt / t_initial)
            t_i = t_initial
            t_curr = tt - i * t_initial
        else:
            i = jnp.floor(jnp.log1p(tt / t_initial * (cycle_mul - 1))
                          / jnp.log(cycle_mul))
            t_i = cycle_mul ** i * t_initial
            t_curr = tt - (1 - cycle_mul ** i) / (1 - cycle_mul) * t_initial
        i = jnp.minimum(i, cycle_limit - 1)
        gamma = cycle_decay ** i
        lr_max = base_lr * gamma
        frac = (t_curr ** k_decay) / (t_i ** k_decay)
        cos_lr = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(math.pi * frac))
        return jnp.where(in_warmup, warm, cos_lr)

    return schedule

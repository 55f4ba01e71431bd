"""Native DDPM noise scheduler.

Replaces the external ``diffusers.DDPMScheduler`` dependency
(reference `diffusion_unet_image_policy.py:11`, config
`configs/model/maniskill2_diffusion_policy_model.yaml:31-38`) with a small,
jit-friendly implementation: all tables are precomputed numpy constants, and
``step`` takes the noise sample explicitly so the reverse loop can run under
``lax.fori_loop`` with a folded PRNG key (no host RNG, no mutable state).

Supported config surface (what the reference exercises): ``beta_schedule`` in
{linear, scaled_linear, squaredcos_cap_v2}, ``prediction_type`` in
{epsilon, sample}, ``variance_type`` fixed_small, ``clip_sample``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp
import numpy as np


def _betas(num_steps: int, beta_start: float, beta_end: float,
           schedule: str) -> np.ndarray:
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_steps, dtype=np.float64)
    if schedule == "scaled_linear":
        return np.linspace(
            beta_start ** 0.5, beta_end ** 0.5, num_steps, dtype=np.float64
        ) ** 2
    if schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(1 - alpha_bar((i + 1) / num_steps) / alpha_bar(i / num_steps),
                0.999)
            for i in range(num_steps)
        ]
        return np.array(betas, np.float64)
    raise NotImplementedError(schedule)


@dataclass(frozen=True)
class DDPMScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    prediction_type: str = "epsilon"
    variance_type: str = "fixed_small"
    _tables: dict = field(default_factory=dict, compare=False, repr=False)

    @property
    def config(self) -> "DDPMScheduler":
        return self

    def _table(self, name: str) -> np.ndarray:
        if not self._tables:
            betas = _betas(self.num_train_timesteps, self.beta_start,
                           self.beta_end, self.beta_schedule)
            alphas = 1.0 - betas
            abar = np.cumprod(alphas)
            self._tables.update(
                betas=betas.astype(np.float32),
                alphas=alphas.astype(np.float32),
                alphas_cumprod=abar.astype(np.float32),
            )
        return self._tables[name]

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return self._table("alphas_cumprod")

    # -- forward process ----------------------------------------------------
    def add_noise(self, sample, noise, timesteps):
        """q(x_t | x_0): sqrt(abar_t) x0 + sqrt(1-abar_t) eps. ``timesteps``
        is (B,) int; broadcast over trailing dims."""
        abar = jnp.asarray(self.alphas_cumprod)[timesteps]
        while abar.ndim < sample.ndim:
            abar = abar[..., None]
        # mix in f32 for schedule precision, return the sample's dtype so the
        # f32 coefficients don't promote the denoiser input under bf16-mixed
        out = jnp.sqrt(abar) * sample.astype(jnp.float32) + jnp.sqrt(
            1.0 - abar
        ) * noise.astype(jnp.float32)
        return out.astype(sample.dtype)

    # -- reverse process ----------------------------------------------------
    def inference_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending timestep grid (diffusers' arange-striding)."""
        step_ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()
        return ts[::-1].copy().astype(np.int32)

    def step(self, model_output, timestep, prev_timestep, sample, noise):
        """One reverse step x_t -> x_{t-1} (diffusers DDPM semantics, variance
        ``fixed_small``). ``noise`` must be standard normal of sample's shape;
        it is gated out at t == 0."""
        abar = jnp.asarray(self.alphas_cumprod)
        abar_t = abar[timestep]
        abar_prev = jnp.where(prev_timestep >= 0, abar[prev_timestep], 1.0)
        beta_t = 1.0 - abar_t / abar_prev  # current (possibly strided) beta
        alpha_t = 1.0 - beta_t

        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(1.0 - abar_t) * model_output) / jnp.sqrt(abar_t)
        elif self.prediction_type == "sample":
            x0 = model_output
        else:
            raise ValueError(
                f"Unsupported prediction type {self.prediction_type}"
            )
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)

        # posterior mean coefficients
        coef_x0 = jnp.sqrt(abar_prev) * beta_t / (1.0 - abar_t)
        coef_xt = jnp.sqrt(alpha_t) * (1.0 - abar_prev) / (1.0 - abar_t)
        mean = coef_x0 * x0 + coef_xt * sample

        if self.variance_type != "fixed_small":
            raise NotImplementedError(self.variance_type)
        variance = jnp.clip(
            beta_t * (1.0 - abar_prev) / (1.0 - abar_t), 1e-20, None
        )
        add = jnp.where(timestep > 0, jnp.sqrt(variance), 0.0)
        # keep the sampling loop carry in the sample's dtype (the f32
        # schedule math would otherwise promote the trajectory after one
        # iteration of the nn.while_loop)
        return (mean + add * noise).astype(sample.dtype)

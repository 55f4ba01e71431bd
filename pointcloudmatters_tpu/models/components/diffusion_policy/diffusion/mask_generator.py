"""Impainting mask generators (reference `diffusion/mask_generator.py:30-241`).

Pure functions of shape (+ optional PRNG key) — no module state. The training
path uses ``LowdimMaskGenerator`` with ``fix_obs_steps=True`` (deterministic,
`diffusion_unet_image_policy.py:85-91`), so the jitted loss needs no mask rng.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


class DummyMaskGenerator:
    def __call__(self, shape, key: Optional[jax.Array] = None):
        return jnp.ones(shape, bool)


class LowdimMaskGenerator:
    """True = conditioned (visible) dims; obs dims of the first
    ``max_n_obs_steps`` timesteps (`mask_generator.py:41-105`)."""

    def __init__(self, action_dim: int, obs_dim: int, max_n_obs_steps: int = 2,
                 fix_obs_steps: bool = True, action_visible: bool = False):
        self.action_dim = action_dim
        self.obs_dim = obs_dim
        self.max_n_obs_steps = max_n_obs_steps
        self.fix_obs_steps = fix_obs_steps
        self.action_visible = action_visible

    def __call__(self, shape, key: Optional[jax.Array] = None):
        B, T, D = shape
        assert D == self.action_dim + self.obs_dim, (D, self.action_dim, self.obs_dim)
        dims = jnp.arange(D)
        is_action_dim = jnp.broadcast_to(dims < self.action_dim, shape)
        is_obs_dim = ~is_action_dim

        if self.fix_obs_steps:
            obs_steps = jnp.full((B,), self.max_n_obs_steps)
        else:
            assert key is not None, "fix_obs_steps=False needs a PRNG key"
            obs_steps = jax.random.randint(
                key, (B,), 1, self.max_n_obs_steps + 1
            )
        steps = jnp.arange(T)[None, :]  # (1, T)
        time_visible = steps < obs_steps[:, None]  # (B, T)
        mask = time_visible[:, :, None] & is_obs_dim

        if self.action_visible:
            action_steps = jnp.maximum(obs_steps - 1, 0)
            action_visible = steps < action_steps[:, None]
            mask = mask | (action_visible[:, :, None] & is_action_dim)
        return mask


class KeypointMaskGenerator:
    """Keypoint dropout masking (`mask_generator.py:108-236`); random parts
    require a key."""

    def __init__(self, action_dim: int, keypoint_dim: int,
                 max_n_obs_steps: int = 2, fix_obs_steps: bool = True,
                 keypoint_visible_rate: float = 0.7,
                 time_independent: bool = False, action_visible: bool = False,
                 context_dim: int = 0, n_context_steps: int = 1):
        self.action_dim = action_dim
        self.keypoint_dim = keypoint_dim
        self.max_n_obs_steps = max_n_obs_steps
        self.fix_obs_steps = fix_obs_steps
        self.keypoint_visible_rate = keypoint_visible_rate
        self.time_independent = time_independent
        self.action_visible = action_visible
        self.context_dim = context_dim
        self.n_context_steps = n_context_steps

    def __call__(self, shape, key: Optional[jax.Array] = None):
        B, T, D = shape
        all_keypoint_dims = D - self.action_dim - self.context_dim
        n_keypoints = all_keypoint_dims // self.keypoint_dim
        if key is None:
            key = jax.random.PRNGKey(0)
        k_obs, k_kp = jax.random.split(key)

        dims = jnp.arange(D)
        is_action = jnp.broadcast_to(dims < self.action_dim, shape)
        is_context = jnp.broadcast_to(
            (dims >= self.action_dim)
            & (dims < self.action_dim + self.context_dim), shape
        )
        is_obs = ~(is_action | is_context)

        if self.fix_obs_steps:
            obs_steps = jnp.full((B,), self.max_n_obs_steps)
        else:
            obs_steps = jax.random.randint(k_obs, (B,), 1, self.max_n_obs_steps + 1)
        steps = jnp.arange(T)[None, :]
        obs_mask = (steps < obs_steps[:, None])[:, :, None] & is_obs

        # keypoint visibility, expanded over each keypoint's dims
        if self.time_independent:
            vis = jax.random.uniform(k_kp, (B, T, n_keypoints))
        else:
            vis = jnp.broadcast_to(
                jax.random.uniform(k_kp, (B, 1, n_keypoints)), (B, T, n_keypoints)
            )
        kp_visible = vis < self.keypoint_visible_rate  # (B, T, K)
        kp_visible = jnp.repeat(kp_visible, self.keypoint_dim, axis=-1)
        pad = D - self.action_dim - self.context_dim - kp_visible.shape[-1]
        kp_full = jnp.concatenate(
            [jnp.ones((B, T, self.action_dim + self.context_dim), bool),
             kp_visible,
             jnp.ones((B, T, pad), bool)], axis=-1,
        )
        obs_mask = obs_mask & kp_full

        context_mask = (steps < self.n_context_steps)[:, :, None] & is_context
        mask = obs_mask | context_mask

        if self.action_visible:
            action_steps = jnp.maximum(obs_steps - 1, 0)
            action_visible = steps < action_steps[:, None]
            mask = mask | (action_visible[:, :, None] & is_action)
        return mask

"""Fused farthest-point-sampling Pallas kernel for TPU.

FPS is the one genuinely sequential hot loop
(`sampling_cuda_kernel.cu:42-128`): npoints iterations, each scanning every
point. The XLA `fori_loop` formulation round-trips the (B, N) min-distance
cache through HBM every iteration (~42 ms for B=32, N=10240, npoints=2048 on
v5e). This kernel runs the whole loop on-chip: coordinates, validity, and
the distance cache live in VMEM; each iteration is a handful of VPU passes.

Lane-axis gathers don't exist on TPU, so the "fetch the last selected
point" step uses the selection one-hot instead: the chosen point's
coordinates are recovered with three masked lane-reductions, and exact
distance ties are broken toward the smaller index (matching argmax-first
semantics) with an iota tie-break.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1.0e10
_IBIG = 2**31 - 1  # python int: jnp constants would be captured consts in the kernel


def _fps_kernel(x_ref, valid_ref, idx_ref, *, npoints):
    # x_ref: (3, B, N)  valid_ref: (B, N) float  idx_ref: (B, npoints) int32
    x0, x1, x2c = x_ref[0], x_ref[1], x_ref[2]          # (B, N) each
    valid = valid_ref[:] > 0                             # (B, N)
    B, N = x0.shape
    x_sq = x0 * x0 + x1 * x1 + x2c * x2c                 # |x|^2, (B, N)

    col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (B, npoints), 1)

    def select(onehot):
        """Coordinates of the one-hot-selected point per row, (B, 1) each."""
        px = jnp.sum(onehot * x0, axis=1, keepdims=True)
        py = jnp.sum(onehot * x1, axis=1, keepdims=True)
        pz = jnp.sum(onehot * x2c, axis=1, keepdims=True)
        p2 = jnp.sum(onehot * x_sq, axis=1, keepdims=True)
        return px, py, pz, p2

    # seed at index 0 (the CUDA kernel seeds at the segment start); all loop
    # carries are 2-D float/int arrays — Mosaic can't legalize rank-1 or
    # bool-carried scf loops
    onehot0 = (col == 0).astype(jnp.float32)
    dist0 = jnp.where(valid, _BIG, -1.0)
    acc0 = jnp.zeros((B, npoints), jnp.int32)
    acc0 = jnp.where(out_col == 0, 0, acc0)  # iteration 0 records the seed

    def body(i, carry):
        dist, onehot, acc = carry
        px, py, pz, p2 = select(onehot)
        d = x_sq + p2 - 2.0 * (x0 * px + x1 * py + x2c * pz)
        dist = jnp.where(valid, jnp.minimum(dist, d), -1.0)
        m = jnp.max(dist, axis=1, keepdims=True)          # (B, 1)
        # exact-tie break toward the smallest index = argmax-first semantics
        cand = jnp.where(dist >= m, col, _IBIG)
        sel = jnp.min(cand, axis=1, keepdims=True)         # (B, 1)
        onehot = (col == sel).astype(jnp.float32)
        acc = jnp.where(out_col == i, sel, acc)
        return dist, onehot, acc

    _, _, acc = jax.lax.fori_loop(1, npoints, body, (dist0, onehot0, acc0))
    idx_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("npoints",))
def farthest_point_sampling_padded_pallas(
    xyz: jax.Array, mask: jax.Array, npoints: int
) -> jax.Array:
    """Drop-in fused replacement for
    ``pointops.farthest_point_sampling_padded`` on TPU.

    The batch is tiled over the grid so VMEM holds only a block of clouds at
    a time (the whole 10k-point flagship batch at B=64 no longer fits the
    16 MB scoped-vmem budget in one shot)."""
    B, N, _ = xyz.shape
    # f32 geometry regardless of the surrounding compute dtype (see pallas_knn)
    x = jnp.moveaxis(xyz.astype(jnp.float32), -1, 0)  # (3, B, N)
    validf = mask.astype(jnp.float32)
    # block: ~8 clouds of 10k points ≈ 2.5 MB resident per grid step. Mosaic
    # requires the sublane block dim to be a multiple of 8 (or the full dim),
    # so odd batches fall back to one whole-batch step (old behavior).
    bb = next((b for b in (8, 16, 24) if B % b == 0), B)
    return pl.pallas_call(
        functools.partial(_fps_kernel, npoints=npoints),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((3, bb, N), lambda b: (0, b, 0)),
            pl.BlockSpec((bb, N), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((bb, npoints), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((B, npoints), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(x, validf)

"""Bisect the bf16 NaN in the refactored token builder on CPU. Not a test."""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloudmatters_tpu.models.components.nn_utils import MaskedBatchNorm
from pointcloudmatters_tpu.ops.pointops import (
    farthest_point_sampling_padded,
    gather_rows_padded,
    knn_query_padded,
)

B, N, M, K, C, D = 8, 2048, 512, 16, 512, 512


class TokenBuilder(nn.Module):
    use_where: bool = True

    @nn.compact
    def __call__(self, coord, feat, valid):
        idx = farthest_point_sampling_padded(coord, valid, M)
        new_xyz = jnp.take_along_axis(coord, idx[..., None], axis=1)
        nn_idx, _ = knn_query_padded(new_xyz, coord, valid, K)
        lin = nn.Dense(D, use_bias=False, name="lin")
        zeros_f = jnp.zeros(new_xyz.shape[:-1] + (feat.shape[-1],), feat.dtype)
        g = lin(jnp.concatenate([coord, feat], axis=-1))
        h = lin(jnp.concatenate([new_xyz, zeros_f], axis=-1))
        gg = gather_rows_padded(g, nn_idx)
        x = gg - h[:, :, None, :]
        if self.use_where:
            x = jnp.where((nn_idx < 0)[..., None], 0.0, x)
        x = MaskedBatchNorm(name="bn")(x, use_running_average=False)
        x = jax.nn.relu(x)
        return jnp.max(x, axis=2)


def run(dtype, use_where=True, partial_valid=True):
    rng = np.random.RandomState(0)
    coord = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 0.4 - 0.2, dtype)
    feat = jnp.asarray(rng.randn(B, N, C).astype(np.float32), dtype)
    counts = np.full((B,), N, np.int32)
    if partial_valid:
        counts[1:] = rng.randint(N // 2, N, B - 1)
    valid = jnp.asarray(np.arange(N)[None] < counts[:, None])

    mod = TokenBuilder(use_where=use_where)
    variables = mod.init(jax.random.PRNGKey(0), coord, feat, valid)
    params = jax.tree.map(lambda x: x.astype(dtype)
                          if jnp.issubdtype(x.dtype, jnp.floating) else x,
                          variables["params"])

    def loss_fn(p):
        out, _ = mod.apply({"params": p, "batch_stats": variables["batch_stats"]},
                           coord, feat, valid, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    bad = [jax.tree_util.keystr(p) for p, g in
           jax.tree_util.tree_flatten_with_path(grads)[0]
           if not bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))]
    print(f"dtype={dtype.__name__} where={use_where} partial={partial_valid} "
          f"loss={float(loss):.3f} bad_grads={bad}")


if __name__ == "__main__":
    run(jnp.float32)
    run(jnp.bfloat16)
    run(jnp.bfloat16, use_where=False)
    run(jnp.bfloat16, partial_valid=False)

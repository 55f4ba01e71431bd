"""Localize the TPU NaN in the refactored token-builder path.

Runs the flagship forward loss and grads in bf16 on the current backend and
prints finiteness per stage. Not part of the test suite.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import build_batch, build_flagship


def cast_floating(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    policy = build_flagship()
    batch = jax.tree.map(jnp.asarray, build_batch(batch_size=32, n_points=10240))
    rng = jax.random.PRNGKey(0)
    variables = policy.init(
        {"params": rng, "vae": rng, "dropout": rng}, batch, train=True
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def loss_fn(params, batch):
        p = cast_floating(params, jnp.bfloat16)
        b = cast_floating(batch, jnp.bfloat16)
        out, updates = policy.apply(
            {"params": p, "batch_stats": batch_stats}, b, train=True,
            rngs={"vae": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return out["loss"].astype(jnp.float32), (out, updates)

    (loss, (out, _)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params, batch)
    loss = float(loss)
    print("loss:", loss, "action:", float(out["action_loss"]),
          "kl:", float(out["kl_loss"]), flush=True)
    print("a_hat finite:", bool(jnp.all(jnp.isfinite(out["a_hat"].astype(jnp.float32)))))
    bad = []
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        if not bool(jnp.all(jnp.isfinite(g.astype(jnp.float32)))):
            bad.append(jax.tree_util.keystr(path))
    print(f"non-finite grads: {len(bad)}/{len(flat)}")
    for b_ in bad[:20]:
        print("  ", b_)


if __name__ == "__main__":
    main()

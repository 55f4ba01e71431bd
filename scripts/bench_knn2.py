"""Compare kNN kernels at flagship shapes, with/without Morton ordering.

    python -u scripts/bench_knn2.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, N, M, K = 32, 10240, 2048, 16


def timeit(name, fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:58s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    from pointcloudmatters_tpu.ops.pallas_knn import knn_query_padded_pallas
    from pointcloudmatters_tpu.ops.pallas_knn2 import knn_query_padded_pallas2
    from pointcloudmatters_tpu.ops.pointops import (
        farthest_point_sampling_padded,
        spatial_sort_order,
    )

    rng = np.random.RandomState(0)
    coord = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 0.4 - 0.2)
    valid = jnp.ones((B, N), bool)

    fps = jax.jit(lambda c, v: farthest_point_sampling_padded(c, v, M))
    idx = fps(coord, valid)
    new_xyz = jnp.take_along_axis(coord, idx[..., None], axis=1)

    k1 = jax.jit(lambda q, c, v: knn_query_padded_pallas(q, c, v, K)[0])
    timeit("knn1 (unsorted)", k1, new_xyz, coord, valid)

    for tn in (256, 512, 1024):
        k2 = jax.jit(lambda q, c, v, tn=tn: knn_query_padded_pallas2(
            q, c, v, K, tn=tn)[0])
        timeit(f"knn2 tn={tn} (unsorted)", k2, new_xyz, coord, valid)

    # Morton-sort cloud and queries
    sort = jax.jit(lambda c, v: spatial_sort_order(c, v))
    order = sort(coord, valid)
    coord_s = jnp.take_along_axis(coord, order[..., None], axis=1)
    qorder = sort(new_xyz, jnp.ones((B, M), bool))
    new_s = jnp.take_along_axis(new_xyz, qorder[..., None], axis=1)

    timeit("knn1 (sorted)", k1, new_s, coord_s, valid)
    for tn in (256, 512, 1024):
        k2 = jax.jit(lambda q, c, v, tn=tn: knn_query_padded_pallas2(
            q, c, v, K, tn=tn)[0])
        timeit(f"knn2 tn={tn} (sorted)", k2, new_s, coord_s, valid)

    # sort cost itself
    timeit("spatial_sort_order (B,N)", sort, coord, valid)
    gat = jax.jit(lambda c, o: jnp.take_along_axis(c, o[..., None], axis=1))
    timeit("gather coord by order", gat, coord, order)

    # correctness cross-check on sorted input
    i1 = np.asarray(k1(new_s, coord_s, valid))
    i2 = np.asarray(jax.jit(lambda q, c, v: knn_query_padded_pallas2(
        q, c, v, K, tn=512)[0])(new_s, coord_s, valid))
    same = (np.sort(i1, -1) == np.sort(i2, -1)).mean()
    print(f"neighbor-set agreement knn1 vs knn2: {same:.6f}", flush=True)


if __name__ == "__main__":
    main()

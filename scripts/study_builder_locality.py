"""Locality study for the fused token-builder kernel (round 5).

For the bench workload (B=32, N=10240 Morton-sorted cloud, M=2048 FPS
queries, K=16 kNN), measure — per block of BM Morton-sorted queries — how
many distinct 128-point chunks of the source cloud the block's BM*K
neighbor indices touch. That count is the while-loop trip count of the
window-anchored gather kernel; see PERF.md.

Run on CPU: JAX_PLATFORMS=cpu python scripts/study_builder_locality.py
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from __graft_entry__ import build_batch
from pointcloudmatters_tpu.ops.pointops import (
    farthest_point_sampling_padded,
    knn_query_padded,
    morton_codes_padded,
)

B, N, M, K = 8, 10240, 2048, 16
batch = build_batch(batch_size=B, n_points=N)
coord = jnp.asarray(batch["pcds"]["coord"])
valid = jnp.asarray(batch["pcds"]["valid"])

fps_idx = farthest_point_sampling_padded(coord, valid, M)
new_xyz = jnp.take_along_axis(coord, fps_idx[..., None], axis=1)
nn_idx, _ = knn_query_padded(new_xyz, coord, valid, K)

# Morton-sort the queries (kernel wrapper will do the same)
qcodes = morton_codes_padded(new_xyz, jnp.ones(fps_idx.shape, bool))
order = jnp.argsort(qcodes, axis=1)
nn_sorted = np.asarray(jnp.take_along_axis(nn_idx, order[..., None], axis=1))

for BM in (64, 128, 256):
    for cpv in (1, 2, 4):  # chunks covered per visit (window = cpv*128)
        visits = []
        lanes = []
        for b in range(B):
            for blk in range(M // BM):
                idx = nn_sorted[b, blk * BM:(blk + 1) * BM].ravel()
                idx = idx[idx >= 0]
                chunks = np.unique(idx // 128)
                # greedy min-anchored visits, each covering [c, c+cpv) chunks
                v = 0
                i = 0
                while i < len(chunks):
                    c0 = chunks[i]
                    while i < len(chunks) and chunks[i] < c0 + cpv:
                        i += 1
                    v += 1
                visits.append(v)
                lanes.append(len(idx))
        visits = np.asarray(visits)
        print(
            f"BM={BM:4d} cpv={cpv}: visits mean={visits.mean():6.2f} "
            f"p50={np.percentile(visits, 50):5.1f} "
            f"p95={np.percentile(visits, 95):5.1f} max={visits.max():4d} "
            f"taa_per_block={visits.mean() * cpv * (BM * K / 128):7.1f}"
        )

# also: unsorted queries (what happens without the Morton re-sort)
for BM in (128,):
    visits = []
    nn_np = np.asarray(nn_idx)
    for b in range(B):
        for blk in range(M // BM):
            idx = nn_np[b, blk * BM:(blk + 1) * BM].ravel()
            idx = idx[idx >= 0]
            visits.append(len(np.unique(idx // 128)))
    v = np.asarray(visits)
    print(f"[unsorted] BM={BM}: visits mean={v.mean():.1f} max={v.max()}")

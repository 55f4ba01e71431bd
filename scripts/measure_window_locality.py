"""Measure Morton-window locality of kNN neighbor indices.

Sizes the windowed token-builder kernel: after the collate Morton-sorts each
cloud and queries are processed in Morton order, what source-row window W
covers the 16-NN of a block of MB consecutive queries, and what fraction of
neighbors fall outside [block_min, block_min + W)?

    python scripts/measure_window_locality.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from pointcloudmatters_tpu.data.collate import morton_order

B, N, M, K = 8, 10240, 2048, 16


def make_cloud(rng, kind):
    if kind == "uniform":
        return rng.rand(N, 3).astype(np.float32) * 0.4 - 0.2
    if kind == "surface":
        # tabletop-ish: a plane + a few blobs (objects) — closer to ManiSkill2
        npl = N // 2
        pts = np.concatenate(
            [
                np.stack(
                    [
                        rng.rand(npl) * 0.4 - 0.2,
                        rng.rand(npl) * 0.4 - 0.2,
                        np.zeros(npl) + rng.randn(npl) * 0.002,
                    ],
                    1,
                ),
                *[
                    rng.randn(N // 8, 3) * 0.02
                    + (rng.rand(3) * 0.25 - 0.125) * np.array([1, 1, 0.3])
                    for _ in range(4)
                ],
            ]
        ).astype(np.float32)
        return pts[:N]
    raise ValueError(kind)


def fps(coord, m):
    n = coord.shape[0]
    idx = np.zeros(m, np.int64)
    dist = np.full(n, np.inf)
    idx[0] = 0
    for i in range(1, m):
        d = np.sum((coord - coord[idx[i - 1]]) ** 2, 1)
        dist = np.minimum(dist, d)
        idx[i] = np.argmax(dist)
    return idx


def main():
    rng = np.random.RandomState(0)
    for kind in ("uniform", "surface"):
        spans, oow = {}, {}
        for b in range(B):
            cloud = make_cloud(rng, kind)
            cloud = cloud[morton_order(cloud)]
            qidx = fps(cloud, M)
            q = cloud[qidx]
            d2 = ((q[:, None, :] - cloud[None, :, :]) ** 2).sum(-1)
            nn = np.argpartition(d2, K, axis=1)[:, :K]  # (M, K) exact-set kNN
            # process queries in Morton (source-index) order
            order = np.argsort(qidx)
            nn = nn[order]
            for MB in (128, 256):
                for W in (1024, 2048, 4096):
                    nb = M // MB
                    blk = nn.reshape(nb, MB * K)
                    lo = blk.min(1)
                    span = blk.max(1) - lo
                    out = (blk - lo[:, None] >= W).mean()
                    spans.setdefault((MB, W), []).append(span)
                    oow.setdefault((MB, W), []).append(out)
        print(f"--- {kind} ---")
        for (MB, W), ss in spans.items():
            ss = np.concatenate(ss)
            o = np.mean(oow[(MB, W)])
            print(
                f"MB={MB:4d} W={W:5d}: span p50={np.percentile(ss,50):6.0f} "
                f"p90={np.percentile(ss,90):6.0f} p99={np.percentile(ss,99):6.0f} "
                f"max={ss.max():6.0f}  out-of-window={o*100:.3f}%"
            )


if __name__ == "__main__":
    main()

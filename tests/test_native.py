"""Native C++ data-path tests: FNV parity, fused voxel subsample semantics."""

import numpy as np
import pytest

from pointcloudmatters_tpu.data import native
from pointcloudmatters_tpu.data.components.transformpcd import (
    GridSamplePCD,
    fnv_hash_vec,
)

needs_native = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native data path"
)


@needs_native
class TestNative:
    def test_fnv_matches_numpy(self):
        rng = np.random.RandomState(0)
        coords = rng.randint(0, 500, (1000, 3)).astype(np.int64)
        got = native.fnv_hash(coords)
        want = fnv_hash_vec(coords)
        np.testing.assert_array_equal(got, want)

    def test_grid_subsample_one_per_voxel(self):
        rng = np.random.RandomState(1)
        coords = rng.randint(0, 8, (5000, 3)).astype(np.int64)
        idx = native.grid_subsample_train(coords, seed=7)
        # one selection per distinct voxel
        n_vox = len(np.unique(fnv_hash_vec(coords)))
        assert len(idx) == n_vox
        # selections are distinct points covering distinct voxels
        assert len(np.unique(idx)) == len(idx)
        keys = fnv_hash_vec(coords[idx])
        assert len(np.unique(keys)) == len(idx)

    def test_grid_segments(self):
        rng = np.random.RandomState(2)
        coords = rng.randint(0, 4, (300, 3)).astype(np.int64)
        order, starts, counts = native.grid_segments(coords)
        assert counts.sum() == 300
        keys = fnv_hash_vec(coords)
        sorted_keys = keys[order]
        for s, c in zip(starts, counts):
            seg = sorted_keys[s:s + c]
            assert (seg == seg[0]).all()

    def test_gridsample_uses_native_and_matches_semantics(self):
        rng = np.random.RandomState(3)
        data = {
            "coord": rng.rand(4000, 3).astype(np.float32) * 0.4,
            "color": rng.rand(4000, 3).astype(np.float32),
        }
        gs = GridSamplePCD(grid_size=0.01, hash_type="fnv", mode="train",
                           return_grid_coord=True, keys=("coord", "color"))
        out = gs(dict(data))
        # voxel count matches the numpy reference computation
        grid = np.floor(data["coord"] / 0.01).astype(int)
        grid -= grid.min(0)
        n_vox = len(np.unique(fnv_hash_vec(grid)))
        assert len(out["coord"]) == n_vox
        assert out["grid_coord"].shape == (n_vox, 3)
        # one point per voxel, each selected point is an original point
        sel_keys = fnv_hash_vec(out["grid_coord"])
        assert len(np.unique(sel_keys)) == n_vox

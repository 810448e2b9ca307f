"""Multi-dataset mixing + pose-validity masking."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmde_tpu.data.mixed import MixedDataset, UnifiedTwoFrame
from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
from mmde_tpu.data.loader import DataLoader
from mmde_tpu import losses


class _FakeSingleFrame:
    """Minimal {image, depth} dataset."""

    def __init__(self, n=6, H=40, W=52, seed=0):
        self.n, self.H, self.W = n, H, W
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image": self.rng.random((self.H, self.W, 3)).astype(np.float32),
                "depth": self.rng.uniform(0.1, 9, (self.H, self.W)).astype(np.float32)}


class TestUnifiedSchema:
    def test_single_frame_identity_pose(self):
        u = UnifiedTwoFrame(_FakeSingleFrame(), "single_frame", (32, 48), 2)
        s = u[0]
        assert s["image1"].shape == (32, 48, 3)
        np.testing.assert_array_equal(s["image1"], s["image2"])
        np.testing.assert_array_equal(s["R12"], np.eye(3, dtype=np.float32))
        assert float(s["pose_valid"]) == 1.0
        assert int(s["dataset_id"]) == 2

    def test_two_frame_pose_passthrough(self):
        ds = SyntheticTwoFrameDataset(num_samples=4, height=32, width=48)
        u = UnifiedTwoFrame(ds, "two_frame_pose", (32, 48), 0)
        s = u[1]
        ref = ds[1]
        np.testing.assert_array_equal(s["R12"], ref["R12"])
        assert float(s["pose_valid"]) == 1.0

    def test_upscales_small_sources(self):
        u = UnifiedTwoFrame(_FakeSingleFrame(H=20, W=24), "single_frame",
                            (32, 48), 0)
        s = u[0]
        assert s["image1"].shape == (32, 48, 3)


class TestMixedDataset:
    def _mixed(self):
        a = UnifiedTwoFrame(SyntheticTwoFrameDataset(num_samples=8, height=32,
                                                     width=48),
                            "two_frame_pose", (32, 48), 0)
        b = UnifiedTwoFrame(_FakeSingleFrame(n=8, H=40, W=56),
                            "single_frame", (32, 48), 1)
        return MixedDataset([a, b], weights=[0.5, 0.5], epoch_size=16, seed=1)

    def test_proportions_and_coverage(self):
        m = self._mixed()
        ids = [int(m[i]["dataset_id"]) for i in range(len(m))]
        assert ids.count(0) == 8 and ids.count(1) == 8

    def test_batches_stack(self):
        m = self._mixed()
        dl = DataLoader(m, batch_size=4, num_workers=2, seed=0)
        batch = next(iter(dl))
        assert batch["image1"].shape == (4, 32, 48, 3)
        assert batch["pose_valid"].shape == (4,)
        assert batch["R12"].shape == (4, 3, 3)


class TestPoseValidMasking:
    def test_invalid_samples_excluded(self):
        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.standard_normal((4, 9)).astype(np.float32))
        tgt = jnp.asarray(rng.standard_normal((4, 9)).astype(np.float32))
        w = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        masked = float(losses.weighted_mse_loss(pred, tgt, w))
        manual = float(np.mean((np.asarray(pred)[[0, 2]] -
                                np.asarray(tgt)[[0, 2]]) ** 2))
        assert np.isclose(masked, manual, rtol=1e-6)

    def test_all_invalid_is_finite_zero(self):
        pred = jnp.ones((2, 9))
        tgt = jnp.zeros((2, 9))
        out = float(losses.weighted_mse_loss(pred, tgt, jnp.zeros(2)))
        assert out == 0.0

    def test_total_loss_uses_mask(self):
        rng = np.random.default_rng(1)
        B, H, W = 2, 16, 16
        preds = {k: jnp.asarray(rng.standard_normal(s).astype(np.float32))
                 for k, s in [("pred_r12", (B, 9)), ("pred_t12", (B, 3)),
                              ("pred_r21", (B, 9)), ("pred_t21", (B, 3))]}
        preds["pred_d1"] = jnp.full((B, H, W), 5.0)
        preds["pred_d2"] = jnp.full((B, H, W), 5.0)
        batch = {"depth1": jnp.full((B, H, W), 5.0),
                 "depth2": jnp.full((B, H, W), 5.0),
                 "R12": jnp.zeros((B, 3, 3)), "T12": jnp.zeros((B, 3)),
                 "R21": jnp.zeros((B, 3, 3)), "T21": jnp.zeros((B, 3)),
                 "pose_valid": jnp.zeros((B,))}
        total, aux = losses.total_loss(preds, batch, decoder="decoder_v2")
        # depth perfect and all pose samples masked -> zero total
        assert float(total) == 0.0

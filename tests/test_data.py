import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from PIL import Image

from mmde_tpu import geometry as geo
from mmde_tpu.data import augment as aug
from mmde_tpu.data.loader import DataLoader, collate
from mmde_tpu.data.manifests import (
    NYU_TEST_SCENES, group_by_scene, make_frame_pairs)
from mmde_tpu.data.void_v3 import VoidV3
from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset


# ---------------------------------------------------------------------------
# Fixtures: fake dataset trees (the loaders are pure functions of a
# directory layout — SURVEY.md §4)
# ---------------------------------------------------------------------------

N_FRAMES = 12
H, W = 48, 64


@pytest.fixture(scope="module")
def void_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("void")
    scene = "scene_a"
    base = root / "void_release/void_1500/data" / scene
    for sub in ("image", "ground_truth", "absolute_pose"):
        (base / sub).mkdir(parents=True)
    raw = root / "void_raw" / scene
    raw.mkdir(parents=True)

    rng = np.random.default_rng(0)
    t0 = 1553634310.0
    stamps = [t0 + 0.1 * i for i in range(N_FRAMES)]
    list_lines = []
    for i, ts in enumerate(stamps):
        name = f"{ts:.6f}.png"
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(base / "image" / name), img)
        depth_mm = rng.integers(500, 5000, (H, W)).astype(np.uint16) * 256 // 1000
        # store as 16-bit PNG in the /256-then-/1000 convention
        depth_png = (rng.uniform(0.5, 8.0, (H, W)) * 1000 * 256).astype(np.uint16)
        Image.fromarray(depth_png, mode="I;16").save(
            str(base / "ground_truth" / name))
        w = rng.standard_normal(3) * 0.05
        t = rng.standard_normal(3) * 0.1
        pose = np.hstack([geo.exp_so3(w), t.reshape(3, 1)])
        np.savetxt(str(base / "absolute_pose" / name.replace(".png", ".txt")),
                   pose)
        list_lines.append(f"void_release/void_1500/data/{scene}/image/{name}")

    K = np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]])
    np.savetxt(str(base / "K.txt"), K)

    # IMU CSV in rostopic-echo format, 50 Hz
    hdr = ("time,field.header.seq,field.header.stamp,"
           "field.linear_acceleration.x,field.linear_acceleration.y,"
           "field.linear_acceleration.z,field.angular_velocity.x,"
           "field.angular_velocity.y,field.angular_velocity.z")
    rows = [hdr]
    for k in range(200):
        ts_ns = int((t0 - 0.1 + 0.02 * k) * 1e9)
        vals = rng.standard_normal(6) * 0.1
        rows.append(f"{ts_ns},{k},{ts_ns}," + ",".join(f"{v:.6f}" for v in vals))
    (raw / "raw.csv").write_text("\n".join(rows))

    calib = {
        "alignment": {"t_camera_to_body": [0.01, 0.02, 0.03],
                      "w_camera_to_body": [0.01, -0.02, 0.005]},
        "imu": {"b_a": [0.1, -0.05, 9.8], "b_g": [0.001, 0.002, -0.001]},
        "camera": {"f_x": 500.0, "f_y": 500.0, "c_x": W / 2, "c_y": H / 2,
                   "k_0": -0.3, "k_1": 0.09, "k_2": -0.01,
                   "p_x": 0.0005, "p_y": -0.0003},
    }
    calib_path = root / "calibration.json"
    calib_path.write_text(json.dumps(calib))

    list_file = root / "train_image.txt"
    list_file.write_text("\n".join(list_lines))
    return {"root": str(root), "list": str(list_file),
            "calib": str(calib_path), "scene": scene}


class TestVoidV3:
    def test_sample_contents(self, void_tree):
        ds = VoidV3(void_tree["root"], void_tree["list"], void_tree["calib"],
                    is_train=False, crop_size=(40, 56),
                    image_interval_range=(3, 3), imu_max_len=64)
        assert len(ds) == N_FRAMES - 3
        s = ds[0]
        assert s["image1"].shape == (H, W, 3)      # eval mode: no crop
        assert s["image1"].dtype == np.float32
        assert 0.0 <= s["image1"].min() and s["image1"].max() <= 1.0
        assert s["depth1"].shape == (H, W)
        assert s["depth1"].max() < 10.0            # meters
        assert s["R12"].shape == (3, 3) and s["T12"].shape == (3,)
        assert s["imu_data"].shape == (64, 7)
        assert s["imu_len"] > 0
        # dt column positive within the valid region
        assert (s["imu_data"][:s["imu_len"], 0] >= 0).all()

    def test_pose_cycle_consistency(self, void_tree):
        ds = VoidV3(void_tree["root"], void_tree["list"], void_tree["calib"],
                    is_train=False, image_interval_range=(3, 3))
        s = ds[2]
        R12, R21 = s["R12"], s["R21"]
        np.testing.assert_allclose(R12 @ R21, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(s["T12"] + R12 @ s["T21"], 0, atol=1e-5)

    def test_train_mode_crops(self, void_tree):
        ds = VoidV3(void_tree["root"], void_tree["list"], void_tree["calib"],
                    is_train=True, crop_size=(40, 56),
                    image_interval_range=(1, 3))
        s = ds[0]
        assert s["image1"].shape == (40, 56, 3)
        assert s["depth1"].shape == (40, 56)

    def test_imu_interval_matches_frames(self, void_tree):
        ds = VoidV3(void_tree["root"], void_tree["list"], void_tree["calib"],
                    is_train=False, image_interval_range=(3, 3))
        s = ds[0]
        n = int(s["imu_len"])
        ts = s["imu_timestamp"][:n]
        # 0.3 s window at 50 Hz -> ~15 samples
        assert 10 <= n <= 20
        assert float(s["timestamp1"]) <= ts[0] + 1e-3
        assert ts[-1] <= float(s["timestamp2"]) + 1e-3


class TestLoader:
    def test_collate_and_shapes(self, void_tree):
        ds = VoidV3(void_tree["root"], void_tree["list"], void_tree["calib"],
                    is_train=True, crop_size=(40, 56),
                    image_interval_range=(1, 2), imu_max_len=32)
        dl = DataLoader(ds, batch_size=4, num_workers=2, seed=1)
        batch = next(iter(dl))
        assert batch["image1"].shape == (4, 40, 56, 3)
        assert batch["R12"].shape == (4, 3, 3)
        assert batch["imu_data"].shape == (4, 32, 7)
        assert isinstance(batch["filename"], list)

    def test_loader_covers_epoch(self):
        ds = SyntheticTwoFrameDataset(num_samples=10, height=8, width=8)
        dl = DataLoader(ds, batch_size=3, num_workers=2, drop_last=True)
        batches = list(dl)
        assert len(batches) == 3

    def test_workers_match_sync(self):
        ds = SyntheticTwoFrameDataset(num_samples=8, height=8, width=8)
        d_sync = DataLoader(ds, batch_size=4, num_workers=0, shuffle=False)
        d_par = DataLoader(ds, batch_size=4, num_workers=3, shuffle=False)
        b1 = next(iter(d_sync))
        b2 = next(iter(d_par))
        np.testing.assert_array_equal(b1["image1"], b2["image1"])


class TestAugment:
    def test_hflip_involution(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (8, 10, 3), dtype=np.uint8)
        dep = rng.random((8, 10)).astype(np.float32)
        i2, d2 = aug.hflip(*aug.hflip(img, dep))
        np.testing.assert_array_equal(img, i2)
        np.testing.assert_array_equal(dep, d2)

    def test_crops(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
        dep = rng.random((20, 30)).astype(np.float32)
        ci, cd = aug.center_crop(img, dep, 10, 12)
        assert ci.shape == (10, 12, 3) and cd.shape == (10, 12)
        np.testing.assert_array_equal(ci, img[5:15, 9:21])
        ri, rd = aug.random_crop(img, dep, 10, 12, rng)
        assert ri.shape == (10, 12, 3)

    def test_depth_strip_paste(self):
        rng = np.random.default_rng(2)
        img = np.zeros((6, 40, 3), np.uint8)
        dep = np.full((6, 40), 7.0, np.float32)
        out = aug.depth_strip_paste(img, dep, rng)
        # some vertical band now carries the depth value in all channels
        cols = np.where((out == 7).all(axis=(0, 2)))[0]
        assert len(cols) >= 1
        assert (np.diff(cols) == 1).all()          # contiguous band

    def test_photometric_ranges(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        for fn in (aug.random_brightness_contrast, aug.random_gamma,
                   aug.hsv_jitter):
            out = fn(img, np.random.default_rng(5), p=1.0)
            assert out.dtype == np.uint8
            assert out.shape == img.shape

    def test_policy_eval_passthrough(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        dep = rng.random((8, 8)).astype(np.float32)
        pol = aug.AugmentPolicy(4, 4, mode="eval")
        pi, pd = pol(img, dep, rng)
        np.testing.assert_allclose(pi, img.astype(np.float32) / 255.0)
        np.testing.assert_array_equal(pd, dep)


class TestNYUPairing:
    def _pairs(self):
        lines = []
        scenes = ["bedroom_0001", "kitchen_0037"]   # 1 train, 1 held-out
        for sc in scenes:
            for i in range(12):
                lines.append((f"/train/{sc}/rgb_{i:05d}.jpg",
                              f"/train/{sc}/sync_depth_{i:05d}.png"))
        return lines

    def test_scene_split(self):
        train = group_by_scene(self._pairs(), is_train=True)
        test = group_by_scene(self._pairs(), is_train=False)
        assert set(train) == {"bedroom_0001"}
        assert set(test) == {"kitchen_0037"}

    def test_train_pair_offsets(self):
        scenes = group_by_scene(self._pairs(), is_train=True)
        pairs = make_frame_pairs(scenes, True, np.random.default_rng(0))
        assert len(pairs) == 11
        for p in pairs:
            i = int(p.frame1.split("_")[-1].split(".")[0])
            j = int(p.frame2.split("_")[-1].split(".")[0])
            assert 1 <= j - i <= 8
            assert p.gt1.endswith(f"{i:05d}.png")

    def test_test_pairs_consecutive(self):
        scenes = group_by_scene(self._pairs(), is_train=False)
        pairs = make_frame_pairs(scenes, False)
        for p in pairs:
            i = int(p.frame1.split("_")[-1].split(".")[0])
            j = int(p.frame2.split("_")[-1].split(".")[0])
            assert j == i + 1


class TestUint8Shipping:
    """uint8 batch shipping + device-side normalize (DataConfig.ship_uint8):
    u8/255 on device must be BIT-EQUAL to the host float32 path."""

    def test_synthetic_uint8_batch_matches_float(self):
        import jax
        import jax.numpy as jnp
        from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
        from mmde_tpu.train.step import _image

        f = SyntheticTwoFrameDataset(num_samples=2, height=32, width=48)
        u = SyntheticTwoFrameDataset(num_samples=2, height=32, width=48,
                                     uint8_images=True)
        bf = next(f.batches(2, 1))
        bu = next(u.batches(2, 1))
        assert bu["image1"].dtype == np.uint8
        a = np.asarray(_image(jnp.asarray(bu["image1"])))
        # device-side u8/255 is BIT-EQUAL to the host-side float conversion
        # of the same uint8 data (synthetic floats aren't uint8-sourced, so
        # quantize the float reference the same way a PNG would have been)
        np.testing.assert_array_equal(
            a, np.round(bf["image1"] * 255.0).astype(np.float32) / 255.0)

    def test_augment_policy_uint8_output(self):
        from mmde_tpu.data import augment as aug

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
        depth = rng.random((40, 50)).astype(np.float32)
        pol = aug.AugmentPolicy(32, 32, mode="v1", output_dtype="uint8")
        out, d = pol(img, depth, rng, sample_index=1)
        assert out.dtype == np.uint8 and out.shape == (32, 32, 3)
        polf = aug.AugmentPolicy(32, 32, mode="eval")
        outf, _ = polf(img, depth, rng)
        assert outf.dtype == np.float32

    def test_train_step_loss_identical(self):
        import jax
        import jax.numpy as jnp
        from mmde_tpu.config import ModelConfig, CnnTransformerConfig
        from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
        from mmde_tpu.models import build_model
        from mmde_tpu.train.optim import build_optimizer
        from mmde_tpu.train.step import TrainState, init_model, \
            make_train_step

        cfg = ModelConfig(backbone="resnet_only", decoder="decoder_v1",
                          model_scale=16, max_depth=10.0,
                          cnn=CnnTransformerConfig(cnn_model="resnet18"),
                          use_pallas_attention=False)
        model = build_model(cfg)
        fds = SyntheticTwoFrameDataset(num_samples=2, height=32, width=48)
        uds = SyntheticTwoFrameDataset(num_samples=2, height=32, width=48,
                                       uint8_images=True)
        bu_np = next(uds.batches(2, 1))
        bf_np = next(fds.batches(2, 1))
        # float twin of the SAME uint8 pixels (host-side conversion)
        for k in ("image1", "image2"):
            bf_np[k] = bu_np[k].astype(np.float32) / 255.0
        bf = jax.tree.map(jnp.asarray, bf_np)
        bu = jax.tree.map(jnp.asarray, bu_np)
        params, bs = init_model(model, jax.random.PRNGKey(0), bf)
        tx, _ = build_optimizer(params, backbone=cfg.backbone,
                                depths=(2, 2, 18, 2), max_lr=5e-4,
                                min_lr=3e-5, weight_decay=0.05,
                                layer_decay=0.9, steps_per_epoch=4, epochs=2)
        state = TrainState.create(params, bs, tx, jax.random.PRNGKey(1))
        step = make_train_step(model, tx, decoder=cfg.decoder,
                               lambda_rot=100.0, lambda_trans=100.0,
                               donate=False)
        _, aux_f = step(state, bf)
        _, aux_u = step(state, bu)
        # XLA may strength-reduce the device-side /255 to a reciprocal
        # multiply: each pixel agrees to <= 1 ulp, not bit-exactly
        np.testing.assert_allclose(float(aux_u["loss_total"]),
                                   float(aux_f["loss_total"]), rtol=1e-4)

    def test_uint8_batch_through_mesh_step(self):
        """uint8 batches must survive the shard_map data-parallel lowering
        (device_put sharding + device-side normalize inside the step)."""
        import jax
        import jax.numpy as jnp
        from mmde_tpu.config import ModelConfig, CnnTransformerConfig
        from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
        from mmde_tpu.models import build_model
        from mmde_tpu.parallel.mesh import make_mesh, replicated_sharding, \
            shard_batch
        from mmde_tpu.train.optim import build_optimizer
        from mmde_tpu.train.step import TrainState, init_model, \
            make_train_step
        import pytest as _pytest

        if jax.device_count() < 8:
            _pytest.skip("needs 8 (virtual) devices")
        cfg = ModelConfig(backbone="resnet_only", decoder="decoder_v1",
                          model_scale=16, max_depth=10.0,
                          cnn=CnnTransformerConfig(cnn_model="resnet18"),
                          use_pallas_attention=False)
        model = build_model(cfg)
        ds = SyntheticTwoFrameDataset(num_samples=8, height=32, width=48,
                                      uint8_images=True)
        batch = next(ds.batches(8, 1))
        assert batch["image1"].dtype == np.uint8
        jb = jax.tree.map(jnp.asarray, batch)
        params, bs = init_model(model, jax.random.PRNGKey(0), jb)
        tx, _ = build_optimizer(params, backbone=cfg.backbone,
                                depths=(2, 2, 18, 2), max_lr=5e-4,
                                min_lr=3e-5, weight_decay=0.05,
                                layer_decay=0.9, steps_per_epoch=4, epochs=2)
        mesh = make_mesh(8)
        state = TrainState.create(params, bs, tx, jax.random.PRNGKey(1))
        state = jax.device_put(state, replicated_sharding(mesh))
        sb = shard_batch(jb, mesh)
        assert sb["image1"].dtype == jnp.uint8
        step = make_train_step(model, tx, decoder=cfg.decoder,
                               lambda_rot=100.0, lambda_trans=100.0,
                               donate=False, mesh=mesh)
        _, aux = step(state, sb)
        assert np.isfinite(float(aux["loss_total"]))

"""Offline pickle generation + v1/v2 pickle loader round trip, using the
same fake VOID tree fixture as test_data."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.test_data import void_tree, N_FRAMES, H, W  # noqa: F401
from mmde_tpu.data.void_pickle import (VoidPickle, generate_pickles,
                                       write_split_lists)


class TestGenerateAndLoad:
    def test_round_trip(self, void_tree, tmp_path):
        out_dir = str(tmp_path / "pickles")
        written = generate_pickles(void_tree["root"], void_tree["calib"],
                                   out_dir, offset_range=(2, 3),
                                   limit_per_scene=5)
        assert len(written) == 5

        train_lst = str(tmp_path / "train.txt")
        test_lst = str(tmp_path / "test.txt")
        write_split_lists(out_dir, train_lst, test_lst, test_fraction=0.4)
        n_train = len(open(train_lst).read().splitlines())
        n_test = len(open(test_lst).read().splitlines())
        assert n_train + n_test == 5

        ds = VoidPickle(train_lst, is_train=False, imu_max_len=64)
        s = ds[0]
        assert s["image1"].shape == (H, W, 3)
        assert s["image1"].dtype == np.float32
        assert s["depth1"].shape == (H, W)
        assert s["depth1"].max() < 10.0
        assert s["rel_pose12"].shape == (12,)
        np.testing.assert_allclose(s["rel_pose12"][:9],
                                   s["R12"].reshape(-1), atol=1e-6)
        # cycle consistency survives the pickle round trip
        np.testing.assert_allclose(s["R12"] @ s["R21"], np.eye(3), atol=1e-5)
        assert s["imu_data"].shape == (64, 7)

    def test_train_crop(self, void_tree, tmp_path):
        out_dir = str(tmp_path / "p2")
        generate_pickles(void_tree["root"], void_tree["calib"], out_dir,
                         offset_range=(2, 2), limit_per_scene=3)
        lst = str(tmp_path / "l.txt")
        write_split_lists(out_dir, lst, str(tmp_path / "t.txt"),
                          test_fraction=0.0)
        ds = VoidPickle(lst, is_train=True, crop_size=(32, 48))
        s = ds[0]
        assert s["image1"].shape == (32, 48, 3)
        assert s["depth1"].shape == (32, 48)


class TestVoidPickleV1:
    """v1 pickle schema (ref dataset/void.py:84-136): IMU gaussian noise
    aug + on-the-fly undistortion of DISTORTED stored images."""

    def _make_pickles(self, tmp_path, n=3):
        import pickle
        rng = np.random.default_rng(5)
        files = []
        for i in range(n):
            d = {
                "raw_image1": rng.integers(0, 255, (H, W, 3), np.uint8),
                "raw_image2": rng.integers(0, 255, (H, W, 3), np.uint8),
                "depth_image1": rng.uniform(500, 8000, (H, W)).astype(
                    np.float32),
                "depth_image2": rng.uniform(500, 8000, (H, W)).astype(
                    np.float32),
                "rel_pose": rng.standard_normal(12).astype(np.float32),
                "imu_data": rng.standard_normal((20, 7)).astype(np.float32),
                "dt": 0.5,
                "Rodrigues": rng.standard_normal(3).astype(np.float32),
            }
            p = tmp_path / f"s{i:03d}.pickle"
            with open(p, "wb") as f:
                pickle.dump([d], f)          # 1-element list, v1 layout
            files.append(str(p))
        lst = tmp_path / "list.txt"
        lst.write_text("\n".join(files))
        return str(lst), files

    def test_transform_applies_noise_and_undistortion(self, void_tree,
                                                      tmp_path):
        import pickle
        from mmde_tpu.data.void_pickle import VoidPickleV1
        lst, files = self._make_pickles(tmp_path)
        with open(files[0], "rb") as f:
            stored = pickle.load(f)[0]

        ds = VoidPickleV1(lst, void_tree["calib"], transform=True,
                          imu_noise_std=0.2, imu_max_len=32)
        s = ds[0]
        # IMU noise: nonzero, ~N(0, 0.2)
        delta = s["imu_data"][:20] - stored["imu_data"]
        assert np.abs(delta).max() > 0
        assert 0.05 < delta.std() < 0.5
        # undistortion changed the image (coeffs are strongly non-zero)
        undist = np.asarray(s["image1"] * 255.0, np.float32)
        assert np.abs(undist - stored["raw_image1"].astype(
            np.float32)).max() > 1.0
        # depth in meters
        np.testing.assert_allclose(s["depth1"],
                                   stored["depth_image1"] / 1000.0)
        assert s["rel_pose"].shape == (12,)
        assert s["imu_len"] == 20

    def test_no_transform_passthrough(self, void_tree, tmp_path):
        import pickle
        from mmde_tpu.data.void_pickle import VoidPickleV1
        lst, files = self._make_pickles(tmp_path)
        with open(files[1], "rb") as f:
            stored = pickle.load(f)[1 - 1]
        ds = VoidPickleV1(lst, void_tree["calib"], transform=False)
        s = ds[1]
        np.testing.assert_allclose(s["imu_data"][:20], stored["imu_data"])
        np.testing.assert_allclose(s["image1"] * 255.0,
                                   stored["raw_image1"].astype(np.float32))

    def test_noise_is_reproducible_per_index(self, void_tree, tmp_path):
        from mmde_tpu.data.void_pickle import VoidPickleV1
        lst, _ = self._make_pickles(tmp_path)
        ds = VoidPickleV1(lst, void_tree["calib"], transform=True)
        a, b = ds[0]["imu_data"], ds[0]["imu_data"]
        np.testing.assert_array_equal(a, b)


class TestRosbagAutoConvert:
    """_SceneCache must convert raw.bag -> raw.csv on miss (ref
    void_dataset_v3.py:89-105) and warn loudly when no IMU source exists."""

    @staticmethod
    def _record(header, data):
        import struct
        hbytes = b""
        for k, v in header.items():
            f = k.encode() + b"=" + v
            hbytes += struct.pack("<I", len(f)) + f
        return (struct.pack("<I", len(hbytes)) + hbytes +
                struct.pack("<I", len(data)) + data)

    def _write_bag(self, path, t0, n=30):
        import struct
        msgs = b""
        conn = self._record({"op": b"\x07", "topic": b"/camera/imu",
                             "conn": struct.pack("<I", 7)}, b"")
        rng = np.random.default_rng(3)
        for k in range(n):
            ts = t0 + 0.02 * k
            secs, nsecs = int(ts), int((ts - int(ts)) * 1e9)
            body = struct.pack("<III", k, secs, nsecs)
            body += struct.pack("<I", 3) + b"imu"
            body += struct.pack("<4d", 0, 0, 0, 1)
            body += struct.pack("<9d", *([0.0] * 9))
            body += struct.pack("<3d", *rng.standard_normal(3))     # gyro
            body += struct.pack("<9d", *([0.0] * 9))
            body += struct.pack("<3d", *rng.standard_normal(3))     # acc
            body += struct.pack("<9d", *([0.0] * 9))
            msgs += self._record(
                {"op": b"\x02", "conn": struct.pack("<I", 7),
                 "time": struct.pack("<Q", int(ts * 1e9))}, body)
        chunk = self._record({"op": b"\x05", "compression": b"none"},
                             conn + msgs)
        with open(path, "wb") as f:
            f.write(b"#ROSBAG V2.0\n" + chunk)

    def _scene_dir(self, tmp_path):
        base = tmp_path / "release" / "sceneX"
        for sub in ("image", "ground_truth", "absolute_pose"):
            (base / sub).mkdir(parents=True)
        np.savetxt(str(base / "K.txt"), np.eye(3))
        raw = tmp_path / "raw" / "sceneX"
        raw.mkdir(parents=True)
        return str(tmp_path / "release"), str(tmp_path / "raw"), raw

    def test_bag_converted_on_miss(self, void_tree, tmp_path):
        from mmde_tpu.data.void_v3 import _SceneCache, load_calibration
        release, rawdir, raw = self._scene_dir(tmp_path)
        t0 = 1553634310.0
        self._write_bag(str(raw / "raw.bag"), t0)
        calib = load_calibration(void_tree["calib"])
        sc = _SceneCache(release, rawdir, "sceneX", calib)
        assert (raw / "raw.csv").is_file()
        assert sc.imu is not None
        assert len(sc.imu["timestamp"]) == 30
        np.testing.assert_allclose(sc.imu["timestamp"][0], t0, atol=1e-6)
        assert sc.imu["acc"].shape == (30, 3)

    def test_warns_without_imu_source(self, void_tree, tmp_path):
        from mmde_tpu.data.void_v3 import _SceneCache, load_calibration
        release, rawdir, _ = self._scene_dir(tmp_path)
        calib = load_calibration(void_tree["calib"])
        with pytest.warns(UserWarning, match="no IMU source"):
            sc = _SceneCache(release, rawdir, "sceneX", calib)
        assert sc.imu is None

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

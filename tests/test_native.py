"""Native C++ preprocessing library vs cv2/numpy oracles."""
import numpy as np
import pytest

from mmde_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build unavailable")
cv2 = pytest.importorskip("cv2")


def identity_maps(h, w):
    mx, my = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    return mx, my


class TestRemap:
    def test_identity_u8(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        mx, my = identity_maps(24, 32)
        out = native.remap_u8(img, mx, my)
        np.testing.assert_array_equal(out, img)

    def test_matches_cv2_u8(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        mx, my = identity_maps(48, 64)
        mx = mx + rng.random(mx.shape).astype(np.float32) * 3 - 1.5
        my = my + rng.random(my.shape).astype(np.float32) * 3 - 1.5
        ours = native.remap_u8(img, mx, my)
        ref = cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        # cv2 uses fixed-point interpolation (5-bit); allow 1-2 LSB
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.max() <= 2, diff.max()
        assert (diff > 1).mean() < 0.01

    def test_matches_cv2_f32(self):
        rng = np.random.default_rng(2)
        img = rng.random((40, 56)).astype(np.float32) * 8
        mx, my = identity_maps(40, 56)
        mx = mx + rng.random(mx.shape).astype(np.float32) - 0.5
        my = my + rng.random(my.shape).astype(np.float32) - 0.5
        ours = native.remap_f32(img, mx, my)
        ref = cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_out_of_bounds_zero(self):
        img = np.full((8, 8), 5.0, np.float32)
        mx = np.full((4, 4), -10.0, np.float32)
        my = np.full((4, 4), -10.0, np.float32)
        out = native.remap_f32(img, mx, my)
        assert (out == 0).all()


class TestNormalizeCrop:
    def test_matches_numpy(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
        out = native.normalize_crop_u8(img, 4, 5, 10, 12)
        expect = img[4:14, 5:17].astype(np.float32) / 255.0
        np.testing.assert_allclose(out, expect, rtol=1e-6)


class TestDepthConvert:
    def test_matches_numpy(self):
        rng = np.random.default_rng(4)
        raw = rng.integers(0, 65535, (32, 48), dtype=np.uint16)
        out = native.depth_u16_to_meters(raw)
        np.testing.assert_allclose(out, raw / 256.0 / 1000.0, rtol=1e-6)

import numpy as np
import jax.numpy as jnp

from mmde_tpu import losses


def silog_np(pred, target, lambd=0.5):
    """Oracle: boolean-indexed port of reference criterion.py:15-21."""
    valid = target > 0
    d = np.log(target[valid]) - np.log(pred[valid])
    return np.sqrt((d ** 2).mean() - lambd * d.mean() ** 2)


class TestSiLog:
    def test_matches_boolean_indexing_oracle(self):
        rng = np.random.default_rng(0)
        pred = rng.uniform(0.1, 10.0, size=(2, 48, 64)).astype(np.float32)
        target = rng.uniform(0.0, 10.0, size=(2, 48, 64)).astype(np.float32)
        target[target < 2.0] = 0.0  # plenty of invalid pixels
        ours = float(losses.silog_loss(jnp.asarray(pred), jnp.asarray(target)))
        oracle = silog_np(pred.astype(np.float64), target.astype(np.float64))
        assert np.isclose(ours, oracle, rtol=1e-5)

    def test_all_valid(self):
        rng = np.random.default_rng(1)
        pred = rng.uniform(0.5, 5.0, size=(64, 64)).astype(np.float32)
        target = rng.uniform(0.5, 5.0, size=(64, 64)).astype(np.float32)
        ours = float(losses.silog_loss(jnp.asarray(pred), jnp.asarray(target)))
        assert np.isclose(ours, silog_np(pred, target), rtol=1e-5)

    def test_perfect_prediction_is_zero(self):
        t = np.full((8, 8), 3.0, dtype=np.float32)
        assert float(losses.silog_loss(jnp.asarray(t), jnp.asarray(t))) == 0.0

    def test_scale_invariance_at_lambda_1(self):
        """With lambd=1 the loss is invariant to a global scale of pred."""
        rng = np.random.default_rng(2)
        pred = rng.uniform(0.5, 5.0, size=(32, 32)).astype(np.float64)
        target = rng.uniform(0.5, 5.0, size=(32, 32)).astype(np.float64)
        l1 = float(losses.silog_loss(jnp.asarray(pred), jnp.asarray(target), 1.0))
        l2 = float(losses.silog_loss(jnp.asarray(pred * 7.3), jnp.asarray(target), 1.0))
        assert np.isclose(l1, l2, atol=1e-5)

    def test_no_nan_with_zero_pixels(self):
        pred = np.ones((4, 4), np.float32)
        target = np.zeros((4, 4), np.float32)  # no valid pixels at all
        out = float(losses.silog_loss(jnp.asarray(pred), jnp.asarray(target)))
        assert np.isfinite(out)


class TestWeightedMSE:
    def test_matches_flat_mse(self):
        rng = np.random.default_rng(3)
        pred = rng.standard_normal((4, 9)).astype(np.float32)
        target = rng.standard_normal((4, 3, 3)).astype(np.float32)
        ours = float(losses.weighted_mse_loss(jnp.asarray(pred), jnp.asarray(target)))
        oracle = np.mean((pred - target.reshape(4, -1)) ** 2)
        assert np.isclose(ours, oracle, rtol=1e-6)


class TestTotalLoss:
    def _fake(self, rng, B=2, H=32, W=32):
        preds = {
            "pred_d1": rng.uniform(0.5, 9.5, (B, H, W)).astype(np.float32),
            "pred_d2": rng.uniform(0.5, 9.5, (B, H, W)).astype(np.float32),
            "pred_r12": rng.standard_normal((B, 9)).astype(np.float32),
            "pred_t12": rng.standard_normal((B, 3)).astype(np.float32),
            "pred_r21": rng.standard_normal((B, 9)).astype(np.float32),
            "pred_t21": rng.standard_normal((B, 3)).astype(np.float32),
        }
        batch = {
            "depth1": rng.uniform(0.0, 10.0, (B, H, W)).astype(np.float32),
            "depth2": rng.uniform(0.0, 10.0, (B, H, W)).astype(np.float32),
            "R12": rng.standard_normal((B, 3, 3)).astype(np.float32),
            "T12": rng.standard_normal((B, 3)).astype(np.float32),
            "R21": rng.standard_normal((B, 3, 3)).astype(np.float32),
            "T21": rng.standard_normal((B, 3)).astype(np.float32),
        }
        return ({k: jnp.asarray(v) for k, v in preds.items()},
                {k: jnp.asarray(v) for k, v in batch.items()})

    def test_decoder_v2_composition(self):
        rng = np.random.default_rng(4)
        preds, batch = self._fake(rng)
        total, aux = losses.total_loss(preds, batch, decoder="decoder_v2",
                                       lambda_rot=100.0, lambda_trans=100.0)
        expect = aux["loss_depth"] + 100.0 * aux["loss_rotation"] \
            + 100.0 * aux["loss_translation"]
        assert np.isclose(float(total), float(expect), rtol=1e-6)
        # v2 rotation loss is the mean of both directions
        r12 = losses.weighted_mse_loss(preds["pred_r12"], batch["R12"])
        r21 = losses.weighted_mse_loss(preds["pred_r21"], batch["R21"])
        assert np.isclose(float(aux["loss_rotation"]),
                          float((r12 + r21) / 2), rtol=1e-6)

    def test_decoder_v1_single_direction(self):
        rng = np.random.default_rng(5)
        preds, batch = self._fake(rng)
        _, aux = losses.total_loss(preds, batch, decoder="decoder_v1")
        r12 = losses.weighted_mse_loss(preds["pred_r12"], batch["R12"])
        t12 = losses.weighted_mse_loss(preds["pred_t12"], batch["T12"])
        assert np.isclose(float(aux["loss_rotation"]), float(r12), rtol=1e-6)
        assert np.isclose(float(aux["loss_translation"]), float(t12), rtol=1e-6)

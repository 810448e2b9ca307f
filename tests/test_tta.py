import numpy as np
import jax.numpy as jnp

from mmde_tpu.train import tta


class TestFlipTTA:
    def test_symmetric_function_unchanged(self):
        """For a flip-equivariant forward (here: identity on a channel
        reduction), flip averaging must reproduce the plain output."""
        def forward(x):
            return jnp.mean(x, axis=-1, keepdims=True)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((2, 8, 12, 3)).astype(np.float32))
        out = tta.flip_average(forward, img)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(forward(img)), rtol=1e-6)

    def test_averages_asymmetric_function(self):
        """A forward that depends on absolute column index gets symmetrized."""
        def forward(x):
            W = x.shape[2]
            col = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
            return jnp.broadcast_to(col, x.shape[:3] + (1,))
        img = jnp.zeros((1, 4, 6, 3))
        out = np.asarray(tta.flip_average(forward, img))
        # average of col and (W-1-col) = (W-1)/2 everywhere
        np.testing.assert_allclose(out, (6 - 1) / 2.0)


class TestShiftWindow:
    def test_positions_cover_width(self):
        xs = tta.shift_window_positions(640, 480, 240)
        assert xs[0] == 0 and xs[-1] == 640 - 480
        assert all(xs[i + 1] > xs[i] for i in range(len(xs) - 1))

    def test_identity_forward_recomposes_exactly(self):
        """If the model returns its input, the recomposed sliding-window
        output must equal the input (coverage-weighted average of identical
        values)."""
        def forward(x):
            return x[..., :1]
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.random((1, 16, 40, 3)).astype(np.float32))
        out = tta.shift_window_eval(forward, img, crop=16, stride=8)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(img[..., :1]), rtol=1e-5)

    def test_coverage_weighting(self):
        """A forward returning all-ones recomposes to exactly ones (counts
        cancel)."""
        def forward(x):
            return jnp.ones(x.shape[:3] + (1,))
        img = jnp.zeros((2, 8, 30, 3))
        out = np.asarray(tta.shift_window_eval(forward, img, crop=8,
                                               stride=5))
        np.testing.assert_allclose(out, 1.0, rtol=1e-6)


class TestShiftWindowTwoFrame:
    """Two-frame composition (VERDICT item 6; ref test.py:93-115)."""

    def test_identity_depth_recomposes_exactly(self):
        def forward(c1, c2):
            return {"pred_d1": jnp.mean(c1, -1, keepdims=True),
                    "pred_d2": jnp.mean(c2, -1, keepdims=True),
                    "pred_r12": jnp.tile(jnp.eye(3).reshape(1, 9),
                                         (c1.shape[0], 1)),
                    "pred_t12": jnp.ones((c1.shape[0], 3)),
                    "pred_r21": None, "pred_t21": None}
        rng = np.random.default_rng(1)
        f1 = jnp.asarray(rng.random((2, 8, 20, 3)).astype(np.float32))
        f2 = jnp.asarray(rng.random((2, 8, 20, 3)).astype(np.float32))
        out = tta.shift_window_eval_two_frame(forward, f1, f2, crop=8,
                                              stride=4)
        np.testing.assert_allclose(np.asarray(out["pred_d1"]),
                                   np.asarray(jnp.mean(f1, -1,
                                                       keepdims=True)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["pred_d2"]),
                                   np.asarray(jnp.mean(f2, -1,
                                                       keepdims=True)),
                                   rtol=1e-5, atol=1e-6)
        assert out["pred_r21"] is None and out["pred_t21"] is None
        # pose: mean of identical identity rotations stays identity; shape B
        assert out["pred_r12"].shape == (2, 9)
        np.testing.assert_allclose(np.asarray(out["pred_r12"][0]).reshape(3, 3),
                                   np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["pred_t12"]), 1.0,
                                   atol=1e-6)

    def test_pose_mean_renormalized(self):
        """Window poses are averaged then re-projected onto SO(3)."""
        from mmde_tpu import geometry as geo
        rots = [geo.exp_so3(np.array([0.0, 0.0, a])) for a in (0.1, 0.3)]

        def forward(c1, c2):
            S_B = c1.shape[0]
            # windows are concatenated S-major: first half window 0, ...
            r = np.stack([rots[0].reshape(9)] * (S_B // 2) +
                         [rots[1].reshape(9)] * (S_B - S_B // 2))
            return {"pred_d1": jnp.zeros(c1.shape[:3] + (1,)),
                    "pred_d2": jnp.zeros(c1.shape[:3] + (1,)),
                    "pred_r12": jnp.asarray(r, jnp.float32),
                    "pred_t12": jnp.zeros((S_B, 3)),
                    "pred_r21": None, "pred_t21": None}

        f = jnp.zeros((1, 4, 12, 3))
        out = tta.shift_window_eval_two_frame(forward, f, f, crop=8, stride=4)
        R = np.asarray(out["pred_r12"]).reshape(3, 3)
        # valid rotation (orthonormal, det +1) near the geodesic midpoint
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99
        mid = geo.exp_so3(np.array([0.0, 0.0, 0.2]))
        np.testing.assert_allclose(R, mid, atol=1e-2)

    def test_model_integration(self):
        """Tiny real model: jitted eval step with shift_window on wide
        input produces finite full-width predictions."""
        import jax
        from mmde_tpu.config import ModelConfig, SwinConfig
        from mmde_tpu.models import build_model
        from mmde_tpu.train.step import (TrainState, init_model,
                                         make_eval_step)
        import optax
        swin = SwinConfig(depths=(1, 1, 1, 1), window_size=(4, 4, 4, 2),
                          pretrain_window_size=(4, 4, 4, 2),
                          use_shift=(True, True, False, False),
                          drop_path_rate=0.0)
        cfg = ModelConfig(backbone="swin_tiny_v2", decoder="decoder_v2",
                          model_scale=32, max_depth=10.0, swin=swin,
                          use_pallas_attention=False)
        model = build_model(cfg)
        rng = np.random.default_rng(0)
        H, W = 32, 48
        batch = {"image1": jnp.asarray(rng.random((1, H, W, 3), np.float32)),
                 "image2": jnp.asarray(rng.random((1, H, W, 3), np.float32)),
                 "depth1": jnp.asarray(rng.uniform(1, 9, (1, H, W))
                                       .astype(np.float32)),
                 "depth2": jnp.asarray(rng.uniform(1, 9, (1, H, W))
                                       .astype(np.float32)),
                 "R12": jnp.tile(jnp.eye(3)[None], (1, 1, 1)),
                 "T12": jnp.zeros((1, 3)),
                 "R21": jnp.tile(jnp.eye(3)[None], (1, 1, 1)),
                 "T21": jnp.zeros((1, 3))}
        params, bs = init_model(model, jax.random.PRNGKey(0), batch)
        state = TrainState.create(params, bs, optax.identity(),
                                  jax.random.PRNGKey(1))
        eval_fn = make_eval_step(model, decoder="decoder_v2",
                                 lambda_rot=100.0, lambda_trans=100.0,
                                 shift_window=H)
        preds, aux = eval_fn(state, batch)
        assert preds["pred_d1"].shape == (1, H, W, 1)
        assert np.isfinite(np.asarray(preds["pred_d1"])).all()
        assert np.isfinite(float(aux["loss_total"]))
        R = np.asarray(preds["pred_r12"][0]).reshape(3, 3)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)

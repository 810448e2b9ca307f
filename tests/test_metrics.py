import numpy as np
import jax.numpy as jnp

from mmde_tpu import metrics


class TestEvalDepthMasked:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        pred = rng.uniform(0.2, 9.0, (480, 640)).astype(np.float32)
        gt = rng.uniform(0.0, 10.0, (480, 640)).astype(np.float32)
        valid = gt > 1e-4
        ours = {k: float(v) for k, v in metrics.eval_depth_masked(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(valid)).items()}
        oracle = metrics.eval_depth_np(pred[valid], gt[valid])
        for k in metrics.DEPTH_METRIC_NAMES:
            assert np.isclose(ours[k], oracle[k], rtol=1e-4, atol=1e-6), k

    def test_perfect_prediction(self):
        gt = np.full((64, 64), 2.5, np.float32)
        out = metrics.eval_depth_masked(jnp.asarray(gt), jnp.asarray(gt),
                                        jnp.ones_like(gt, dtype=bool))
        assert float(out["d1"]) == 1.0
        assert float(out["rmse"]) == 0.0
        assert float(out["abs_rel"]) == 0.0


class TestEvalMask:
    def test_nyu_crop(self):
        pred = np.ones((480, 640), np.float32)
        gt = np.full((480, 640), 5.0, np.float32)
        _, _, mask = metrics.eval_mask("nyudepthv2", jnp.asarray(pred),
                                       jnp.asarray(gt), min_depth_eval=1e-4,
                                       max_depth_eval=10.0)
        mask = np.asarray(mask)
        assert mask[45:471, 41:601].all()
        assert not mask[:45].any() and not mask[471:].any()
        assert not mask[:, :41].any() and not mask[:, 601:].any()

    def test_clamps_inf_nan(self):
        pred = np.array([[np.inf, np.nan], [1.0, 2.0]], np.float32)
        gt = np.full((2, 2), 5.0, np.float32)
        p, _, _ = metrics.eval_mask("void", jnp.asarray(pred), jnp.asarray(gt),
                                    min_depth_eval=1e-4, max_depth_eval=10.0)
        p = np.asarray(p)
        assert p[0, 0] == 10.0 and p[0, 1] == np.float32(1e-4)

    def test_depth_range_mask(self):
        pred = np.ones((4, 4), np.float32)
        gt = np.array([[0.0, 5.0, 11.0, 1e-5]] * 4, np.float32)
        _, _, mask = metrics.eval_mask("void", jnp.asarray(pred), jnp.asarray(gt),
                                       min_depth_eval=1e-4, max_depth_eval=10.0)
        mask = np.asarray(mask)
        assert (mask[:, 1]).all()
        assert not mask[:, 0].any() and not mask[:, 2].any() and not mask[:, 3].any()

    def test_kitti_garg_crop(self):
        H, W = 352, 1216
        pred = np.ones((H, W), np.float32)
        gt = np.full((H, W), 5.0, np.float32)
        _, _, mask = metrics.eval_mask("kitti", jnp.asarray(pred), jnp.asarray(gt),
                                       min_depth_eval=1e-3, max_depth_eval=80.0,
                                       kitti_crop="garg_crop")
        mask = np.asarray(mask)
        r0, r1 = int(0.40810811 * H), int(0.99189189 * H)
        c0, c1 = int(0.03594771 * W), int(0.96405229 * W)
        assert mask[r0:r1, c0:c1].all()
        assert not mask[:r0].any()


class TestEvalPose:
    def test_identity_poses_zero(self):
        B = 3
        eye = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()
        zero3 = np.zeros((B, 3), np.float32)
        pose = {"R12": jnp.asarray(eye), "T12": jnp.asarray(zero3),
                "R21": jnp.asarray(eye), "T21": jnp.asarray(zero3)}
        out = metrics.eval_pose(pose, pose)
        for k in metrics.POSE_METRIC_NAMES:
            assert np.isclose(float(out[k]), 0.0, atol=1e-7), k

    def test_cycle_consistency_of_true_inverse(self):
        from mmde_tpu import geometry as geo
        rng = np.random.default_rng(1)
        w = rng.standard_normal(3) * 0.5
        R12 = geo.exp_so3(w).astype(np.float32)
        t12 = rng.standard_normal(3).astype(np.float32)
        R21 = R12.T
        t21 = (-R21 @ t12).astype(np.float32)
        pred = {"R12": jnp.asarray(R12[None]), "T12": jnp.asarray(t12[None]),
                "R21": jnp.asarray(R21[None]), "T21": jnp.asarray(t21[None])}
        out = metrics.eval_pose(pred, pred)
        assert float(out["pose_mse_r_identity"]) < 1e-10
        assert float(out["pose_mse_t_identity"]) < 1e-10

    def test_mse_values(self):
        B = 2
        pred = {"R12": jnp.ones((B, 9)), "T12": jnp.zeros((B, 3)),
                "R21": None, "T21": None}
        tgt = {"R12": jnp.zeros((B, 3, 3)), "T12": jnp.ones((B, 3)),
               "R21": None, "T21": None}
        out = metrics.eval_pose(pred, tgt)
        assert np.isclose(float(out["pose_mse_r12"]), 1.0)
        assert np.isclose(float(out["pose_mse_t12"]), 1.0)
        assert float(out["pose_mse_r21"]) == 0.0

"""Per-sample metric kernels + mesh-sharded validation.

Covers round-3 items: validation must use the mesh (reference equivalent
validated on all DataParallel GPUs, train.py:260-284) and per-sample metric
semantics must equal the reference's batch-size-1 protocol.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmde_tpu import metrics as M


class TestPerSampleDepthMetrics:
    def test_matches_numpy_oracle_per_sample(self):
        rng = np.random.default_rng(0)
        B, H, W = 3, 20, 24
        pred = rng.uniform(0.1, 9, (B, H, W)).astype(np.float32)
        gt = rng.uniform(0.1, 9, (B, H, W)).astype(np.float32)
        valid = rng.random((B, H, W)) > 0.3
        out = M.eval_depth_masked_per_sample(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(valid))
        for i in range(B):
            ref = M.eval_depth_np(pred[i][valid[i]], gt[i][valid[i]])
            for k, v in ref.items():
                np.testing.assert_allclose(float(out[k][i]), v, rtol=1e-4,
                                           err_msg=f"sample {i} metric {k}")

    def test_zero_valid_sample_is_zero(self):
        pred = jnp.ones((2, 4, 4))
        gt = jnp.ones((2, 4, 4))
        valid = jnp.asarray(np.stack([np.ones((4, 4), bool),
                                      np.zeros((4, 4), bool)]))
        out = M.eval_depth_masked_per_sample(pred, gt, valid)
        assert float(out["rmse"][1]) == 0.0
        assert float(out["d1"][0]) == 1.0

    def test_batch_mean_matches_global_when_uniform(self):
        """With every sample fully valid and identical valid counts, the
        mean of per-sample linear metrics equals the pooled version."""
        rng = np.random.default_rng(1)
        pred = rng.uniform(0.5, 5, (4, 8, 8)).astype(np.float32)
        gt = rng.uniform(0.5, 5, (4, 8, 8)).astype(np.float32)
        valid = np.ones((4, 8, 8), bool)
        per = M.eval_depth_masked_per_sample(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(valid))
        pooled = M.eval_depth_masked(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(valid))
        for k in ("d1", "d2", "d3", "abs_rel", "sq_rel", "log10"):
            np.testing.assert_allclose(float(jnp.mean(per[k])),
                                       float(pooled[k]), rtol=1e-5)


class TestPerSamplePoseMetrics:
    def test_matches_batchwise_at_bs1(self):
        rng = np.random.default_rng(2)
        pred = {k: jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
                for k, n in (("R12", 9), ("T12", 3), ("R21", 9), ("T21", 3))}
        tgt = {k: jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
               for k, n in (("R12", 9), ("T12", 3), ("R21", 9), ("T21", 3))}
        per = M.eval_pose_per_sample(pred, tgt)
        for i in range(3):
            one = M.eval_pose({k: v[i:i + 1] for k, v in pred.items()},
                              {k: v[i:i + 1] for k, v in tgt.items()})
            for k in one:
                np.testing.assert_allclose(float(per[k][i]), float(one[k]),
                                           rtol=1e-5, atol=1e-7)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestMeshValidate:
    """validate() on an 8-device mesh must equal the single-device run,
    including the padded non-divisible tail batch."""

    def _setup(self):
        from mmde_tpu.config import Config, ModelConfig, SwinConfig, replace
        from mmde_tpu.models import build_model
        from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
        from mmde_tpu.data.loader import DataLoader
        from mmde_tpu.train.step import TrainState, init_model
        import optax

        swin = SwinConfig(depths=(1, 1, 1, 1), window_size=(4, 4, 4, 2),
                          pretrain_window_size=(4, 4, 4, 2),
                          use_shift=(True, True, False, False),
                          drop_path_rate=0.0)
        mcfg = ModelConfig(backbone="swin_nano_v2", decoder="decoder_v2",
                           model_scale=32, max_depth=10.0, swin=swin,
                           use_pallas_attention=False)
        cfg = Config(model=mcfg)
        cfg = replace(cfg, data=replace(cfg.data, dataset="synthetic",
                                        crop_h=32, crop_w=32))
        model = build_model(mcfg)
        ds = SyntheticTwoFrameDataset(num_samples=5, height=32, width=32)
        sample = next(iter(DataLoader(ds, 1, shuffle=False, num_workers=0)))
        sample_j = {k: jnp.asarray(v) for k, v in sample.items()
                    if isinstance(v, np.ndarray)}
        params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                         sample_j)
        state = TrainState.create(params, batch_stats, optax.identity(),
                                  jax.random.PRNGKey(0))
        return cfg, model, ds, state

    def test_mesh_matches_single_device(self):
        from mmde_tpu.data.loader import DataLoader
        from mmde_tpu.parallel.mesh import make_mesh, replicated_sharding
        from mmde_tpu.train.loop import validate
        from mmde_tpu.train.step import make_eval_metrics_step

        cfg, model, ds, state = self._setup()
        kw = dict(dataset=cfg.data.dataset, decoder=cfg.model.decoder,
                  lambda_rot=100.0, lambda_trans=100.0,
                  min_depth_eval=cfg.eval.min_depth_eval,
                  max_depth_eval=cfg.eval.max_depth_eval,
                  do_kb_crop=cfg.data.do_kb_crop,
                  kitti_crop=cfg.data.kitti_crop)

        single = make_eval_metrics_step(model, mesh=None, **kw)
        r1, _ = validate(single, state,
                         DataLoader(ds, 1, shuffle=False, num_workers=0,
                                    drop_last=False), cfg, n_shards=1)

        mesh = make_mesh(8)
        sharded = make_eval_metrics_step(model, mesh=mesh, **kw)
        mstate = jax.device_put(state, replicated_sharding(mesh))
        # 5 samples in one batch of 8 (3 padded) — exercises the tail pad
        r8, _ = validate(sharded, mstate,
                         DataLoader(ds, 8, shuffle=False, num_workers=0,
                                    drop_last=False), cfg, n_shards=8)
        for k in r1:
            np.testing.assert_allclose(r8[k], r1[k], rtol=5e-4, atol=1e-6,
                                       err_msg=f"metric {k}")

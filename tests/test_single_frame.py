"""Single-frame GLPDepth path: train step + TTA evaluation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmde_tpu.config import Config, ModelConfig, SwinConfig, DataConfig, \
    EvalConfig
from mmde_tpu.models import build_model
from mmde_tpu.train import single_frame as sf
from mmde_tpu.train.optim import build_optimizer
from mmde_tpu.train.step import TrainState
import dataclasses


def tiny_cfg():
    swin = SwinConfig(depths=(1, 1, 1, 1), window_size=(4, 4, 4, 2),
                      pretrain_window_size=(4, 4, 4, 2),
                      use_shift=(True, True, False, False),
                      drop_path_rate=0.0)
    model = ModelConfig(backbone="swin_tiny_v2", family="glpdepth",
                        model_scale=32, max_depth=10.0, swin=swin,
                        use_pallas_attention=False)
    return Config(model=model,
                  data=DataConfig(dataset="void", crop_h=32, crop_w=32),
                  eval=EvalConfig(min_depth_eval=1e-4, max_depth_eval=10.0))


def batches(n, B=2, H=32, W=32, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        yield {"image": rng.random((B, H, W, 3)).astype(np.float32),
               "depth": rng.uniform(0.5, 9, (B, H, W)).astype(np.float32)}


@pytest.fixture(scope="module")
def trained():
    cfg = tiny_cfg()
    model = build_model(cfg.model)
    sample = next(batches(1))
    params, bs = sf.init_single(model, jax.random.PRNGKey(0),
                                jax.tree.map(jnp.asarray, sample))
    tx, _ = build_optimizer(params, backbone=cfg.model.backbone,
                            depths=cfg.model.swin.depths, max_lr=1e-3,
                            min_lr=1e-4, weight_decay=0.05, layer_decay=0.9,
                            steps_per_epoch=4, epochs=2)
    state = TrainState.create(params, bs, tx, jax.random.PRNGKey(1))
    return cfg, model, tx, state


class TestSingleFrameTrain:
    def test_step_runs_and_finite(self, trained):
        cfg, model, tx, state = trained
        step = sf.make_single_train_step(model, tx, donate=False)
        for batch in batches(3):
            state, aux = step(state, jax.tree.map(jnp.asarray, batch))
            assert np.isfinite(float(aux["loss_depth"]))


class TestSingleFrameEval:
    def test_plain_eval_metrics(self, trained):
        cfg, model, tx, state = trained
        result = sf.evaluate_single(model, state, batches(2), cfg)
        for k in ("d1", "rmse", "abs_rel"):
            assert np.isfinite(result[k])
        assert 0.0 <= result["d1"] <= 1.0

    def test_flip_tta(self, trained):
        cfg, model, tx, state = trained
        result = sf.evaluate_single(model, state, batches(2), cfg,
                                    flip_tta=True)
        assert np.isfinite(result["rmse"])

    def test_shift_window_tta_wide_image(self, trained):
        cfg, model, tx, state = trained
        wide = [{"image": np.random.default_rng(3).random(
                    (1, 32, 64, 3)).astype(np.float32),
                 "depth": np.random.default_rng(4).uniform(
                    0.5, 9, (1, 32, 64)).astype(np.float32)}]
        result = sf.evaluate_single(model, state, wide, cfg,
                                    shift_window_tta=True, shift_crop=32)
        assert np.isfinite(result["rmse"])

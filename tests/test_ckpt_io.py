"""Orbax checkpoint IO: exact resume + eval-side restore.

Regression coverage for the round-5 convergence-gate find: tools/eval.py
builds its TrainState with optax.identity() (no optimizer), so a
StandardRestore against a TRAINING checkpoint (real AdamW opt_state tree)
fails on the structure mismatch. restore_eval restores params/batch_stats/
step without a template and prefers the best-RMSE checkpoint, the
reference's eval protocol (checkpoint_best.pth, utils/util.py:51-65).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mmde_tpu.config import ModelConfig, CnnTransformerConfig
from mmde_tpu.models import build_model
from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
from mmde_tpu.train.optim import build_optimizer
from mmde_tpu.train.step import TrainState, init_model, make_train_step
from mmde_tpu.ckpt import orbax_io


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    cfg = ModelConfig(backbone="resnet_only_multi_scale",
                      decoder="decoder_v2", model_scale=16, max_depth=10.0,
                      cnn=CnnTransformerConfig(cnn_model="resnet18"),
                      use_pallas_attention=False)
    model = build_model(cfg)
    ds = SyntheticTwoFrameDataset(num_samples=2, height=32, width=48)
    batch = jax.tree.map(jnp.asarray, next(ds.batches(2, 1)))
    params, bstats = init_model(model, jax.random.PRNGKey(0), batch)
    tx, _ = build_optimizer(params, backbone=cfg.backbone,
                            depths=(2, 2, 18, 2), max_lr=5e-4, min_lr=3e-5,
                            weight_decay=0.05, layer_decay=0.9,
                            steps_per_epoch=2, epochs=2)
    state = TrainState.create(params, bstats, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, decoder=cfg.decoder, lambda_rot=1.0,
                           lambda_trans=1.0, donate=False)
    state, _ = step(state, batch)          # real AdamW opt_state contents
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    orbax_io.save_epoch(ckpt_dir, state, 1)
    best = orbax_io.BestTracker(ckpt_dir)
    assert best.update(state, 1, 0.5)
    state2, _ = step(state, batch)
    orbax_io.save_epoch(ckpt_dir, state2, 2)
    return cfg, model, tx, state, state2, batch, ckpt_dir


def test_exact_resume_roundtrip(trained_ckpt):
    cfg, model, tx, state, state2, batch, ckpt_dir = trained_ckpt
    template = jax.tree.map(jnp.zeros_like, state2)
    restored, epoch = orbax_io.restore(ckpt_dir, template)
    assert epoch == 2
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_eval_into_optimizerless_state(trained_ckpt):
    """The gate-caught bug: eval's optax.identity() TrainState must be able
    to receive a training checkpoint's params/batch_stats/step."""
    cfg, model, tx, state, state2, batch, ckpt_dir = trained_ckpt
    params, bstats = init_model(model, jax.random.PRNGKey(3), batch)
    eval_state = TrainState.create(params, bstats, optax.identity(),
                                   jax.random.PRNGKey(0))
    restored, epoch, kind = orbax_io.restore_eval(ckpt_dir, eval_state,
                                                  prefer_best=False)
    assert (epoch, kind) == (2, "epoch")
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_eval_prefers_best(trained_ckpt):
    """With a best/ dir present, eval restores the best-RMSE checkpoint
    (saved at epoch 1) over the newer epoch-2 one."""
    cfg, model, tx, state, state2, batch, ckpt_dir = trained_ckpt
    params, bstats = init_model(model, jax.random.PRNGKey(3), batch)
    eval_state = TrainState.create(params, bstats, optax.identity(),
                                   jax.random.PRNGKey(0))
    restored, epoch, kind = orbax_io.restore_eval(ckpt_dir, eval_state)
    assert (epoch, kind) == (1, "best")
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

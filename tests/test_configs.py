"""Shipped config files: schema parsing + one train step per BASELINE config.

BASELINE.json configs and their YAML files:
  #2 swin_v2 + decoder_v1, NYU 480x640       -> configs/nyu_swin_decoder_v1.yaml
  #3 cnn_transformer + decoder_v2, KITTI     -> configs/kitti_cnn_transformer.yaml
     352x1216 garg crop
  #4 VOID two-frame (canonical)              -> configs/void.yaml
  #5 mixed NYU+KITTI+VOID bf16 data-parallel -> configs/mixed_bf16_dp.yaml

Each smoke test loads the YAML verbatim and runs ONE train step with the
parsed model config. For the swin-base configs the stage depths are reduced
(2,2,18,2 -> 1,1,1,1) and the input shrunk — a full 88M-param CPU step
would dominate the suite — but backbone family, decoder, dtype, window
sizes, shift flags and eval-crop settings all come straight from the file.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmde_tpu.config import load_yaml
from mmde_tpu.models import build_model
from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
from mmde_tpu.train.optim import build_optimizer
from mmde_tpu.train.step import TrainState, init_model, make_train_step

CONFIGS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def _one_step(mcfg, *, batch=2, hw=(32, 32), mesh=None):
    model = build_model(mcfg)
    ds = SyntheticTwoFrameDataset(num_samples=batch, height=hw[0],
                                  width=hw[1])
    jbatch = jax.tree.map(jnp.asarray, next(ds.batches(batch, 1)))
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), jbatch)
    tx, _ = build_optimizer(params, backbone=mcfg.backbone,
                            depths=mcfg.swin.depths, max_lr=5e-4, min_lr=3e-5,
                            weight_decay=0.05, layer_decay=0.9,
                            steps_per_epoch=4, epochs=2)
    state = TrainState.create(params, batch_stats, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, decoder=mcfg.decoder, lambda_rot=100.0,
                           lambda_trans=100.0, donate=False, mesh=mesh)
    if mesh is not None:
        from mmde_tpu.parallel.mesh import replicated_sharding, shard_batch
        state = jax.device_put(state, replicated_sharding(mesh))
        jbatch = shard_batch(jbatch, mesh)
    new_state, aux = step(state, jbatch)
    assert np.isfinite(float(aux["loss_total"]))
    return new_state


def _shrunk_swin(mcfg):
    """Same family/windows/flags as the file, stage depths cut for CPU."""
    swin = dataclasses.replace(mcfg.swin, depths=(1, 1, 1, 1),
                               use_checkpoint=False, drop_path_rate=0.0,
                               pretrained="")
    return dataclasses.replace(mcfg, swin=swin, use_pallas_attention=False)


class TestNyuSwinDecoderV1:
    """BASELINE config #2 (ref models/model.py:35-68 + decoder_v1.py)."""

    def test_parse(self):
        cfg = load_yaml(os.path.join(CONFIGS, "nyu_swin_decoder_v1.yaml"))
        assert cfg.data.dataset == "nyudepthv2"
        assert (cfg.data.crop_h, cfg.data.crop_w) == (480, 640)
        assert cfg.model.backbone == "swin_base_v2"
        assert cfg.model.decoder == "decoder_v1"
        assert cfg.model.model_scale == 32
        assert cfg.model.dtype == "bfloat16"
        assert cfg.model.swin.depths == (2, 2, 18, 2)
        assert cfg.model.swin.window_size == (30, 30, 30, 15)
        assert cfg.model.swin.use_checkpoint

    def test_one_train_step(self):
        cfg = load_yaml(os.path.join(CONFIGS, "nyu_swin_decoder_v1.yaml"))
        _one_step(_shrunk_swin(cfg.model), batch=2, hw=(32, 32))


class TestKittiCnnTransformer:
    """BASELINE config #3 (ref models/cnn_transformer.py + decoder_v2.py,
    KB crop + garg eval crop utils/metrics.py:45-66)."""

    def test_parse(self):
        cfg = load_yaml(os.path.join(CONFIGS, "kitti_cnn_transformer.yaml"))
        assert cfg.data.dataset == "kitti"
        assert (cfg.data.crop_h, cfg.data.crop_w) == (352, 1216)
        assert cfg.data.do_kb_crop
        assert cfg.data.kitti_crop == "garg_crop"
        assert cfg.model.backbone == "cnn_transformer_multi_scale"
        assert cfg.model.decoder == "decoder_v2"
        assert cfg.model.model_scale == 16
        assert cfg.model.max_depth == 80.0
        assert cfg.eval.max_depth_eval == 80.0

    def test_one_train_step(self):
        cfg = load_yaml(os.path.join(CONFIGS, "kitti_cnn_transformer.yaml"))
        # resnet50 + 6 encoder layers runs as configured; only the input is
        # shrunk (352x1216 -> 64x96, /16 feature map stays non-degenerate)
        _one_step(cfg.model, batch=2, hw=(64, 96))

    def test_kitti_garg_mask(self):
        from mmde_tpu import metrics as M
        cfg = load_yaml(os.path.join(CONFIGS, "kitti_cnn_transformer.yaml"))
        gt = jnp.full((1, 352, 1216), 5.0)
        pred = jnp.full((1, 352, 1216), 5.0)
        _, _, mask = M.eval_mask("kitti", pred, gt,
                                 min_depth_eval=cfg.eval.min_depth_eval,
                                 max_depth_eval=cfg.eval.max_depth_eval,
                                 do_kb_crop=cfg.data.do_kb_crop,
                                 kitti_crop=cfg.data.kitti_crop)
        # garg crop region of a 352x1216 KB-cropped frame
        # (ref utils/metrics.py:53-58)
        r0, r1 = int(0.40810811 * 352), int(0.99189189 * 352)
        c0, c1 = int(0.0359477 * 1216), int(0.96405229 * 1216)
        expect = np.zeros((352, 1216), bool)
        expect[r0:r1, c0:c1] = True
        np.testing.assert_array_equal(np.asarray(mask[0]), expect)


class TestMixedBf16DataParallel:
    """BASELINE config #5: bf16 + 8-device data-parallel mesh."""

    def test_parse(self):
        cfg = load_yaml(os.path.join(CONFIGS, "mixed_bf16_dp.yaml"))
        assert cfg.data.dataset == "mixed"
        assert cfg.model.dtype == "bfloat16"
        assert cfg.train.batch_size == 64
        assert cfg.mesh.num_devices == 0

    def test_one_sharded_train_step(self):
        from mmde_tpu.parallel.mesh import make_mesh
        if jax.device_count() < 8:
            pytest.skip("needs 8 (virtual) devices")
        cfg = load_yaml(os.path.join(CONFIGS, "mixed_bf16_dp.yaml"))
        mesh = make_mesh(8)
        _one_step(_shrunk_swin(cfg.model), batch=8, hw=(32, 32), mesh=mesh)


class TestNyuMiniResnet:
    """BASELINE config #1: resnet_only, NYU mini split, 240x320, batch 2 —
    the CPU-runnable baseline (ref models/resnet_only.py wiring)."""

    def test_parse(self):
        cfg = load_yaml(os.path.join(CONFIGS, "nyu_mini_resnet.yaml"))
        assert cfg.data.dataset == "nyudepthv2"
        assert (cfg.data.crop_h, cfg.data.crop_w) == (240, 320)
        assert cfg.train.batch_size == 2
        assert cfg.model.backbone == "resnet_only_multi_scale"
        assert cfg.model.decoder == "decoder_v2"
        assert cfg.model.cnn.cnn_model == "resnet18"

    def test_one_train_step(self):
        cfg = load_yaml(os.path.join(CONFIGS, "nyu_mini_resnet.yaml"))
        # resnet18 is small: run exactly as configured, input shrunk only
        _one_step(cfg.model, batch=cfg.train.batch_size, hw=(64, 96))

    def test_one_train_step_non_div32_crop(self):
        # The SHIPPED crop (240x320) is NOT /32-divisible: the multi-scale
        # fusion aligns f3/f5 to f4's grid (round 5 — the reference's own
        # torch.cat crashes on the off-by-one here, cnn_transformer.py:
        # 123-126, so its multi_scale encoders only ever ran at /32 crops).
        # 48x64 reproduces the same ragged case (H/32 = 1.5) CPU-cheaply.
        cfg = load_yaml(os.path.join(CONFIGS, "nyu_mini_resnet.yaml"))
        _one_step(cfg.model, batch=2, hw=(48, 64))


class TestVoidDownscale16Completion:
    """BASELINE config #4 depth-completion variant: glpdepth_scale16 custom
    network + sparse-depth fusion (ref train_void_with_downscale16.py)."""

    def test_parse(self):
        cfg = load_yaml(os.path.join(CONFIGS,
                                     "void_downscale16_completion.yaml"))
        assert cfg.data.dataset == "void"
        assert cfg.model.family == "glpdepth_scale16"
        assert cfg.model.sparse_depth_input
        assert cfg.model.model_scale == 16
        assert cfg.model.swin.depths == (2, 2, 18, 2)

    def test_one_train_step(self):
        cfg = load_yaml(os.path.join(CONFIGS,
                                     "void_downscale16_completion.yaml"))
        mcfg = _shrunk_swin(cfg.model)
        model = build_model(mcfg)
        ds = SyntheticTwoFrameDataset(num_samples=2, height=32, width=32,
                                      sparse_depth=True)
        jbatch = jax.tree.map(jnp.asarray, next(ds.batches(2, 1)))
        assert "sparse_depth1" in jbatch
        params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                         jbatch)
        tx, _ = build_optimizer(params, backbone=mcfg.backbone,
                                depths=mcfg.swin.depths, max_lr=5e-4,
                                min_lr=3e-5, weight_decay=0.05,
                                layer_decay=0.9, steps_per_epoch=4, epochs=2)
        state = TrainState.create(params, batch_stats, tx,
                                  jax.random.PRNGKey(1))
        step = make_train_step(model, tx, decoder=mcfg.decoder,
                               lambda_rot=100.0, lambda_trans=100.0,
                               donate=False)
        _, aux = step(state, jbatch)
        assert np.isfinite(float(aux["loss_total"]))


class TestVoidCanonical:
    """BASELINE config #4 family file (already the canonical example)."""

    def test_parse(self):
        cfg = load_yaml(os.path.join(CONFIGS, "void.yaml"))
        assert cfg.data.dataset == "void"
        assert cfg.model.backbone == "cnn_transformer_multi_scale"
        assert cfg.train.max_lr == pytest.approx(5e-4)
        assert cfg.train.layer_decay == pytest.approx(0.9)


class TestAllShippedConfigsParse:
    """Every YAML in configs/ must load through the schema (catches a new
    config — e.g. the round-5 convergence-gate variants — drifting from
    the reference-compatible key set, ref configs/config.py:9-107)."""

    @pytest.mark.parametrize("name", sorted(
        f for f in os.listdir(CONFIGS) if f.endswith(".yaml")))
    def test_parse(self, name):
        cfg = load_yaml(os.path.join(CONFIGS, name))
        assert cfg.train.batch_size >= 1
        assert cfg.model.backbone
        # every shipped config must name a buildable model family
        assert cfg.model.decoder in ("decoder_v1", "decoder_v2") or \
            cfg.model.family in ("glpdepth", "glpdepth_scale16")

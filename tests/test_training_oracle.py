"""TRAINING-DYNAMICS oracle: K optimizer steps of the reference's own
composed model + losses + optimizer vs our train step, from identical
converted weights on identical batches.

Every other oracle in this suite is forward-only; this one pins the
gradients, the AdamW update (layer-decay scales, selective weight decay,
bias correction), the LR schedule, and the BN running-stat updates — the
places a silent training divergence could hide while all forward tests
stay green. Reference anchors: the train loop (train.py:180-250: LR
formula :195-200, losses :215-230, zero_grad/backward/step), the losses
(utils/criterion.py SiLogLoss/WeightedMSELoss), and the optimizer
construction (train.py:113-115 + models/optimizer.py
SwinLayerDecayOptimizerConstructor, run here AS-IS under the
tests/_ref_stubs mmcv shim).

Protocol: reference IDEDepth (swin_tiny_v2 scale-16 + decoder_v2, fp32,
drop_path 0) trains K=4 steps in torch; our TwoFrameDepthPose + fused
layer-decay AdamW trains the same steps from the converted initial
weights. Per-step total losses must agree, and the FINAL parameters must
agree update-relative: |ours - theirs| / |theirs - init| per leaf.
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import test_composed_oracle as tco  # noqa: E402
import test_reference_oracle as tro  # noqa: E402

K_STEPS = 4
MAX_LR = 5e-4
MIN_LR = 3e-5
WEIGHT_DECAY = 0.05
LAYER_DECAY = 0.9
# Adam eps is raised from 1e-8 to 1e-3 ON BOTH SIDES for this oracle: at
# eps=1e-8 the first-step update is ~sign(g), so elements whose gradient
# sits near the cross-framework fp32 noise floor (BN-backward cancellation
# puts pose-conv grads at ~3e-4 rel; measured vs torch) flip sign and the
# comparison drifts chaotically (~50x/step) without any semantic
# divergence. eps is a passthrough hyperparameter on both sides, so the
# oracle still pins moments, bias correction, weight-decay masking, layer
# decay and the LR schedule — it caught the ConvTranspose kernel-flip and
# motivated torch-exact BN running stats at these settings.
ADAM_EPS = 1e-3
LAMBDA1 = LAMBDA2 = 100.0
# reference train.py:186-201 with iterations per epoch = 1, epochs = 4:
# half_epoch = 2, so steps 1-2 follow the warmup branch, 3-4 the decay.
EPOCHS = 4
ITERS_PER_EPOCH = 1


def _make_batches(rng, n, B=2, H=64, W=64):
    """Shared numpy batches: depth targets include zeros (SiLog mask)."""
    batches = []
    for _ in range(n):
        d1 = rng.uniform(0.5, 9.5, (B, H, W)).astype(np.float32)
        d2 = rng.uniform(0.5, 9.5, (B, H, W)).astype(np.float32)
        d1[:, :4] = 0.0                       # invalid rows exercise the mask
        d2[:, -4:] = 0.0
        batches.append({
            "image1": rng.standard_normal((B, 3, H, W)).astype(np.float32),
            "image2": rng.standard_normal((B, 3, H, W)).astype(np.float32),
            "depth1": d1, "depth2": d2,
            "R12": rng.standard_normal((B, 3, 3)).astype(np.float32),
            "T12": rng.standard_normal((B, 3, 1)).astype(np.float32) * 0.1,
            "R21": rng.standard_normal((B, 3, 3)).astype(np.float32),
            "T21": rng.standard_normal((B, 3, 1)).astype(np.float32) * 0.1,
        })
    return batches


def _ref_lr(global_step):
    """train.py:195-200 verbatim (iterations=ITERS_PER_EPOCH)."""
    half_epoch = EPOCHS // 2
    frac = global_step / ITERS_PER_EPOCH / half_epoch
    if global_step < ITERS_PER_EPOCH * half_epoch:
        return (MAX_LR - MIN_LR) * frac ** 0.9 + MIN_LR
    return max(MIN_LR, (MIN_LR - MAX_LR) * (frac - 1) ** 0.9 + MAX_LR)


def _torch_train(tmodel, batches):
    """Reference train loop: build_optimizers AS-IS + the inline LR formula
    + zero_grad/backward/step order (train.py:203-246)."""
    ref_opt = tco._load_ref_file("models/optimizer.py", "refmodels.optimizer")
    crit = tco._load_ref_file("utils/criterion.py", "refutils.criterion")

    optimizer = ref_opt.build_optimizers(tmodel, dict(
        type="AdamW", lr=MAX_LR, betas=(0.9, 0.999), eps=ADAM_EPS,
        weight_decay=WEIGHT_DECAY,
        constructor="SwinLayerDecayOptimizerConstructor",
        paramwise_cfg=dict(num_layers=[1, 1, 1, 1],
                           layer_decay_rate=LAYER_DECAY,
                           no_decay_names=["relative_position_bias_table",
                                           "rpe_mlp", "logit_scale"])))
    criterion_d = crit.SiLogLoss()
    criterion_p = crit.WeightedMSELoss()

    tmodel.train()
    losses = []
    for step, b in enumerate(batches):
        global_step = step + 1
        current_lr = _ref_lr(global_step)
        for g in optimizer.param_groups:
            g["lr"] = current_lr * g["lr_scale"]
        preds = tmodel(torch.from_numpy(b["image1"]),
                       torch.from_numpy(b["image2"]))
        optimizer.zero_grad()
        loss_d1 = criterion_d(preds["pred_d1"].squeeze(1),
                              torch.from_numpy(b["depth1"]))
        loss_d2 = criterion_d(preds["pred_d2"].squeeze(1),
                              torch.from_numpy(b["depth2"]))
        loss_depth = (loss_d1 + loss_d2) / 2
        loss_R = (criterion_p(preds["pred_r12"], torch.from_numpy(b["R12"]))
                  + criterion_p(preds["pred_r21"],
                                torch.from_numpy(b["R21"]))) / 2
        loss_T = (criterion_p(preds["pred_t12"], torch.from_numpy(b["T12"]))
                  + criterion_p(preds["pred_t21"],
                                torch.from_numpy(b["T21"]))) / 2
        loss_total = loss_depth + LAMBDA1 * loss_R + LAMBDA2 * loss_T
        loss_total.backward()
        optimizer.step()
        losses.append(float(loss_total))
    return losses


def _convert(tmodel, fmodel, variables):
    """torch state dict -> our (params, batch_stats) trees, layout-checked
    against `variables` (the same rig as the composed forward oracle)."""
    from mmde_tpu.ckpt import torch_convert as tc

    enc_sd, rest_sd = tco._split_sd(tmodel)
    enc_params, report = tc.convert_swin(enc_sd)
    assert not [r for r in report if r.startswith("unmapped")], report
    dec_sd = {k[len("decoder."):]: v for k, v in rest_sd.items()}
    dec_params, dec_stats = tro._convert_decoder_v2(dec_sd)
    merged_enc, missing, unexpected = tc.apply_pretrained(
        dict(variables["params"]["encoder"]), enc_params)
    assert not missing and not unexpected, (missing, unexpected)
    params = {"encoder": merged_enc,
              "decoder": jax.tree.map(jnp.asarray, dec_params)}
    stats = {"decoder": jax.tree.map(jnp.asarray, dec_stats)}
    return params, stats


def test_training_dynamics_parity(monkeypatch):
    import flax.linen as fnn

    from mmde_tpu.config import ModelConfig, SwinConfig
    from mmde_tpu.models import build_model
    from mmde_tpu.train.optim import build_optimizer
    from mmde_tpu.train.step import TrainState, make_train_step

    tco._alias_ref_models()
    ref_model = tco._load_ref_file("models/model.py", "refmodels.model")

    args = types.SimpleNamespace(
        backbone="swin_tiny_v2", decoder="decoder_v2", model_scale=16,
        max_depth=10.0, depths=[1, 1, 1, 1], window_size=[8, 8, 4, 4],
        pretrain_window_size=[4, 4, 2, 2],
        use_shift=[True, True, False, False], drop_path_rate=0.0,
        use_checkpoint=False, pretrained=None)
    tmodel = ref_model.IDEDepth(args)
    tco._randomize(tmodel, seed=7)

    # Dropout masks are framework-RNG (decoder_v2.py:8-20 Regression p=0.5);
    # no cross-framework seed can align them, so the oracle zeroes dropout
    # on BOTH sides. Everything else runs exact train-mode semantics
    # (batch-stat BN + running-stat updates, droppath 0 by config).
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        lambda self, x, deterministic=None, rng=None: x)

    swin = SwinConfig(depths=(1, 1, 1, 1), window_size=(8, 8, 4, 4),
                      pretrain_window_size=(4, 4, 2, 2),
                      use_shift=(True, True, False, False),
                      drop_path_rate=0.0)
    cfg = ModelConfig(backbone="swin_tiny_v2", decoder="decoder_v2",
                      model_scale=16, max_depth=10.0, swin=swin,
                      use_pallas_attention=False)
    fmodel = build_model(cfg)

    rng = np.random.default_rng(11)
    batches = _make_batches(rng, K_STEPS)

    # --- our side: convert INITIAL weights before torch trains ---
    j1 = jnp.asarray(np.transpose(batches[0]["image1"], (0, 2, 3, 1)))
    j2 = jnp.asarray(np.transpose(batches[0]["image2"], (0, 2, 3, 1)))
    variables = fmodel.init({"params": jax.random.PRNGKey(0)}, j1, j2, False)
    params0, stats0 = _convert(tmodel, fmodel, variables)

    tx, _ = build_optimizer(
        params0, backbone=cfg.backbone, depths=(1, 1, 1, 1),
        max_lr=MAX_LR, min_lr=MIN_LR, weight_decay=WEIGHT_DECAY,
        layer_decay=LAYER_DECAY, steps_per_epoch=ITERS_PER_EPOCH,
        epochs=EPOCHS, eps=ADAM_EPS, fused=True)
    step = make_train_step(fmodel, tx, decoder="decoder_v2",
                           lambda_rot=LAMBDA1, lambda_trans=LAMBDA2,
                           donate=False)
    state = TrainState.create(params0, stats0, tx, jax.random.PRNGKey(1))

    our_losses = []
    for b in batches:
        jb = {"image1": jnp.asarray(np.transpose(b["image1"], (0, 2, 3, 1))),
              "image2": jnp.asarray(np.transpose(b["image2"], (0, 2, 3, 1))),
              "depth1": jnp.asarray(b["depth1"]),
              "depth2": jnp.asarray(b["depth2"]),
              "R12": jnp.asarray(b["R12"]), "T12": jnp.asarray(b["T12"]),
              "R21": jnp.asarray(b["R21"]), "T21": jnp.asarray(b["T21"])}
        state, aux = step(state, jb)
        our_losses.append(float(aux["loss_total"]))

    # --- reference side trains on the SAME weights/batches ---
    ref_losses = _torch_train(tmodel, batches)

    # Tolerance calibration (measured): with BN in eval mode every gradient
    # leaf matches torch at ~5e-7 rel (pure fp32 matmul noise); train-mode
    # BN backward goes through batch-statistic cancellation that amplifies
    # that noise to ~3e-4 on the pose convs, and each optimizer step
    # compounds it ~10x through the BN-heavy pose stack. 3e-3 over 4 steps
    # sits just above that floor; real semantic bugs are orders larger
    # (the ConvTranspose kernel-flip this oracle caught showed 1.7% by
    # step 3 and 1.3 update-relative on the depth kernels).
    np.testing.assert_allclose(
        our_losses, ref_losses, rtol=3e-3,
        err_msg="per-step training losses diverged (train.py:215-230)")

    # --- final parameters, update-relative per leaf ---
    params_ref, stats_ref = _convert(tmodel, fmodel, variables)
    flat0 = jax.tree_util.tree_flatten_with_path(params0)[0]
    flat_ours = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(params_ref)[0]
    worst = ("", 0.0)
    for (p0, l0), (pa, la), (pb, lb) in zip(flat0, flat_ours, flat_ref):
        assert jax.tree_util.keystr(p0) == jax.tree_util.keystr(pa) \
            == jax.tree_util.keystr(pb)
        a = np.asarray(la, np.float64)
        b = np.asarray(lb, np.float64)
        move = np.linalg.norm(b - np.asarray(l0, np.float64))
        err = np.linalg.norm(a - b) / (move + 1e-12)
        if move > 1e-6 and err > worst[1]:
            worst = (jax.tree_util.keystr(pa), err)
        # err is meaningful only when the parameter actually moved; for
        # near-static leaves (zero-grad biases under eps=1e-3) bound the
        # absolute drift instead. Threshold calibration: multi-dim KERNELS
        # (where structural bugs live — the deconv kernel-flip this oracle
        # caught measured 130%+ there) sit well under 10%; 1-D affine/bias
        # leaves of the pose BNs carry the full batch-stat-cancellation
        # gradient noise (measured 7-15% across runs after 4 steps) and
        # get a wider noise allowance.
        tol = 1e-1 if la.ndim > 1 else 3e-1
        rms = np.linalg.norm(a - b) / np.sqrt(a.size)
        assert err < tol or rms < 1e-4, \
            (jax.tree_util.keystr(pa), err, move, rms)

    # --- BN running stats (torch-unbiased-var EMA semantics) ---
    flat_s_ours = jax.tree_util.tree_flatten_with_path(state.batch_stats)[0]
    flat_s0 = jax.tree_util.tree_flatten_with_path(stats0)[0]
    flat_s_ref = jax.tree_util.tree_flatten_with_path(stats_ref)[0]
    for (p0, s0), (pa, sa), (pb, sb) in zip(flat_s0, flat_s_ours, flat_s_ref):
        a = np.asarray(sa, np.float64)
        b = np.asarray(sb, np.float64)
        move = np.linalg.norm(b - np.asarray(s0, np.float64))
        err = np.linalg.norm(a - b) / (move + 1e-12)
        rms = np.linalg.norm(a - b) / np.sqrt(a.size)
        assert err < 1e-1 or rms < 1e-4, \
            (jax.tree_util.keystr(pa), err, move, rms)
    print(f"worst update-relative param error: {worst}")

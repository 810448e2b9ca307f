"""FULL-MODEL parity oracles against the reference's own model classes.

The module-level oracles (tests/test_reference_oracle.py) pin the SwinV2
encoder and Decoder_v2 separately; these tests compose them the way the
reference does and compare END TO END:

  * IDEDepth (reference models/model.py:115-126: concat frames -> shared
    encoder -> chunk -> decoder) vs our TwoFrameDepthPose (interleave-
    reshape at models/two_frame.py:147-160) — an interleave-vs-concat or
    wiring mismatch would slip through module-level tests.
  * GLPDepth (reference models/backup/model_.py:17-71: encoder -> deconv
    decoder -> last_layer_depth, sigmoid * max_depth) vs our GLPDepth.

The reference classes are imported directly (models/model.py and
models/backup/model_.py run under the tests/_ref_stubs timm/mmcv shims,
with the "models" package aliased so their intra-package imports resolve),
and their random-init state dicts are converted through
mmde_tpu.ckpt.torch_convert.
"""
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import test_reference_oracle as tro  # noqa: E402  (same-dir test module)

_REF = "/root/reference"


def _alias_ref_models():
    """Make `import models.X` resolve to the (cuda-patched) reference
    modules loaded by tro._load_ref, so models/model.py and
    models/backup/model_.py import cleanly."""
    for name in ("swin_transformer_v2", "decoder_v1", "decoder_v2",
                 "cnn_transformer", "resnet_only"):
        tro._load_ref(name)
    sys.modules["models"] = sys.modules["refmodels"]
    for name in ("swin_transformer_v2", "decoder_v1", "decoder_v2",
                 "cnn_transformer", "resnet_only"):
        sys.modules[f"models.{name}"] = sys.modules[f"refmodels.{name}"]


def _load_ref_file(relpath: str, mod_name: str):
    """exec a reference file (e.g. models/backup/model_.py) as a module."""
    _alias_ref_models()
    if mod_name in sys.modules:
        return sys.modules[mod_name]
    path = os.path.join(_REF, relpath)
    with open(path) as f:
        src = f.read()
    mod = types.ModuleType(mod_name)
    mod.__file__ = path
    sys.modules[mod_name] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def _randomize(tmodel, seed=0, std=0.05):
    """Non-degenerate weights + BN running stats (default init leaves many
    tensors at 0/1, which would hide conversion mistakes)."""
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(std=std)
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(std=0.1)
                m.running_var.uniform_(0.5, 1.5)
    tmodel.eval()


def _split_sd(tmodel):
    sd = tro._sd_numpy(tmodel)
    enc = {k[len("encoder."):]: v for k, v in sd.items()
           if k.startswith("encoder.")}
    rest = {k: v for k, v in sd.items() if not k.startswith("encoder.")}
    return enc, rest


class TestIDEDepthComposedOracle:
    """swin (model_scale 16, 3 stages) + decoder_v2, full forward parity
    (ref models/model.py:35-68 scale-16 wiring and :115-126 forward)."""

    def test_forward_parity(self):
        from mmde_tpu.ckpt import torch_convert as tc
        from mmde_tpu.config import ModelConfig, SwinConfig
        from mmde_tpu.models import build_model

        _alias_ref_models()
        ref_model = _load_ref_file("models/model.py", "refmodels.model")

        args = types.SimpleNamespace(
            backbone="swin_tiny_v2", decoder="decoder_v2", model_scale=16,
            max_depth=10.0, depths=[1, 1, 1, 1], window_size=[8, 8, 4, 4],
            pretrain_window_size=[4, 4, 2, 2],
            use_shift=[True, True, False, False], drop_path_rate=0.0,
            use_checkpoint=False, pretrained=None)
        tmodel = ref_model.IDEDepth(args)
        _randomize(tmodel, seed=0)

        swin = SwinConfig(depths=(1, 1, 1, 1), window_size=(8, 8, 4, 4),
                          pretrain_window_size=(4, 4, 2, 2),
                          use_shift=(True, True, False, False),
                          drop_path_rate=0.0)
        cfg = ModelConfig(backbone="swin_tiny_v2", decoder="decoder_v2",
                          model_scale=16, max_depth=10.0, swin=swin,
                          use_pallas_attention=False)
        fmodel = build_model(cfg)

        rng = np.random.default_rng(3)
        f1 = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        f2 = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(f1), torch.from_numpy(f2))

        j1 = jnp.asarray(np.transpose(f1, (0, 2, 3, 1)))
        j2 = jnp.asarray(np.transpose(f2, (0, 2, 3, 1)))
        variables = fmodel.init({"params": jax.random.PRNGKey(0)}, j1, j2,
                                False)

        enc_sd, rest_sd = _split_sd(tmodel)
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

        def paths(t):
            return {jax.tree_util.keystr(p)
                    for p, _ in jax.tree_util.tree_flatten_with_path(t)[0]}
        assert paths(params) == paths(variables["params"])
        assert paths(stats) == paths(variables["batch_stats"])

        f_out = fmodel.apply({"params": params, "batch_stats": stats},
                             j1, j2, False)

        for key, is_map in (("pred_d1", True), ("pred_d2", True),
                            ("pred_r12", False), ("pred_t12", False),
                            ("pred_r21", False), ("pred_t21", False)):
            t = t_out[key].numpy()
            f = np.asarray(f_out[key])
            if is_map:
                f = np.transpose(f, (0, 3, 1, 2))
            np.testing.assert_allclose(
                f, t, rtol=1e-3, atol=1e-4,
                err_msg=f"{key} (ref model.py:115-126 composed forward)")


def _convert_glp_decoder(sd):
    """Reference GLPDepth decoder+head (backup/model_.py:74-161 Decoder and
    :57-61 last_layer_depth) -> our GLPDepth param/stat trees."""
    from mmde_tpu.ckpt.torch_convert import conv_kernel, deconv_kernel

    params: dict = {"decoder": {}}
    stats: dict = {"decoder": {}}
    n_deconv = len([k for k in sd if k.startswith("decoder.deconv_layers.")
                    and k.endswith(".weight") and "running" not in k]) // 2
    for i in range(n_deconv):
        params["decoder"][f"deconv_{i}"] = {
            "kernel": deconv_kernel(sd[f"decoder.deconv_layers.{3 * i}.weight"])}
        b = f"decoder.deconv_layers.{3 * i + 1}"
        params["decoder"][f"deconv_bn_{i}"] = {"scale": sd[b + ".weight"],
                                               "bias": sd[b + ".bias"]}
        stats["decoder"][f"deconv_bn_{i}"] = {"mean": sd[b + ".running_mean"],
                                              "var": sd[b + ".running_var"]}
    params["decoder"]["conv"] = {
        "kernel": conv_kernel(sd["decoder.conv_layers.0.weight"]),
        "bias": sd["decoder.conv_layers.0.bias"]}
    params["decoder"]["conv_bn"] = {"scale": sd["decoder.conv_layers.1.weight"],
                                    "bias": sd["decoder.conv_layers.1.bias"]}
    stats["decoder"]["conv_bn"] = {"mean": sd["decoder.conv_layers.1.running_mean"],
                                   "var": sd["decoder.conv_layers.1.running_var"]}
    params["head_a"] = {"kernel": conv_kernel(sd["last_layer_depth.0.weight"]),
                        "bias": sd["last_layer_depth.0.bias"]}
    params["head_b"] = {"kernel": conv_kernel(sd["last_layer_depth.2.weight"]),
                        "bias": sd["last_layer_depth.2.bias"]}
    return params, stats


class TestGLPDepthComposedOracle:
    """Legacy single-frame GLPDepth end to end (ref backup/model_.py:65-71:
    encoder -> Decoder -> last_layer_depth -> sigmoid * max_depth)."""

    def test_forward_parity(self):
        from mmde_tpu.ckpt import torch_convert as tc
        from mmde_tpu.config import ModelConfig, SwinConfig
        from mmde_tpu.models.glpdepth import GLPDepth

        ref_glp = _load_ref_file("models/backup/model_.py",
                                 "refmodels.backup_model")

        args = types.SimpleNamespace(
            backbone="swin_tiny_v2", max_depth=10.0, depths=[1, 1, 1, 1],
            window_size=[4, 4, 4, 2], pretrain_window_size=[2, 2, 2, 2],
            use_shift=[True, True, False, False], drop_path_rate=0.0,
            use_checkpoint=False, pretrained=None, num_deconv=3,
            num_filters=[32, 32, 32], deconv_kernels=[2, 2, 2])
        tmodel = ref_glp.GLPDepth(args)
        _randomize(tmodel, seed=1)

        swin = SwinConfig(depths=(1, 1, 1, 1), window_size=(4, 4, 4, 2),
                          pretrain_window_size=(2, 2, 2, 2),
                          use_shift=(True, True, False, False),
                          drop_path_rate=0.0)
        cfg = ModelConfig(backbone="swin_tiny_v2", family="glpdepth",
                          model_scale=32, max_depth=10.0, swin=swin,
                          use_pallas_attention=False)
        fmodel = GLPDepth(cfg=cfg)

        rng = np.random.default_rng(4)
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(x))

        jx = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        variables = fmodel.init({"params": jax.random.PRNGKey(0)}, jx)

        enc_sd, rest_sd = _split_sd(tmodel)
        enc_params, report = tc.convert_swin(enc_sd)
        assert not [r for r in report if r.startswith("unmapped")], report
        dec_params, dec_stats = _convert_glp_decoder(rest_sd)

        merged_enc, missing, unexpected = tc.apply_pretrained(
            dict(variables["params"]["encoder"]), enc_params)
        assert not missing and not unexpected, (missing, unexpected)

        params = dict(dec_params)
        params["encoder"] = merged_enc

        def paths(t):
            return {jax.tree_util.keystr(p)
                    for p, _ in jax.tree_util.tree_flatten_with_path(t)[0]}
        assert paths(params) == paths(variables["params"])
        assert paths(dec_stats) == paths(variables["batch_stats"])

        f_out = fmodel.apply(
            {"params": params,
             "batch_stats": jax.tree.map(jnp.asarray, dec_stats)}, jx)

        t = t_out["pred_d"].numpy()
        f = np.transpose(np.asarray(f_out["pred_d"]), (0, 3, 1, 2))
        np.testing.assert_allclose(
            f, t, rtol=1e-3, atol=1e-4,
            err_msg="pred_d (ref backup/model_.py:65-71 composed forward)")

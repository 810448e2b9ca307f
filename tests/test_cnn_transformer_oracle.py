"""Parity oracle for the ResNet / cnn_transformer encoder family against the
reference's own PyTorch code (models/cnn_transformer.py, resnet_only.py).

torchvision is absent from this image, so tests/_ref_stubs/torchvision
provides a hand-rolled resnet18/50 stand-in with torchvision's exact module
structure — the reference's `nn.Sequential(*resnet.children())[:k]` slicing
(cnn_transformer.py:39-48) runs on it unchanged. Random weights + running
stats are converted through ckpt.torch_convert.convert_cnn_transformer.

Inputs use EVEN spatial extents on purpose: stride-2 convs at even sizes are
exactly where flax "SAME" padding diverges from torch's pad=1 (grid shifted
one pixel, residual branches misaligned) — the bug class these oracles pin.
"""
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_reference_oracle import _load_ref, _sd_numpy  # noqa: E402

from mmde_tpu.ckpt import torch_convert as tc  # noqa: E402


def _randomize(tmodel, seed=0, std=0.03):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(std=std)
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(std=0.1)
                m.running_var.uniform_(0.5, 1.5)
            if isinstance(m, torch.nn.LayerNorm):
                m.weight.normal_(mean=1.0, std=0.05)


def _paths(t):
    return {jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(t)[0]}


class TestCnnTransformerOracle:
    def test_forward_parity_multi_scale(self):
        ref = _load_ref("cnn_transformer")
        args = types.SimpleNamespace(cnn_model="resnet18",
                                     transformer_ff_dim=512)
        tmodel = ref.cnn_transformer(args, hidden_dim=256, n_enc_layers=2,
                                     resnet_multi_scale=True)
        _randomize(tmodel)
        tmodel.eval()

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 3, 64, 96)).astype(np.float32)
        with torch.no_grad():
            (t_out,) = tmodel(torch.from_numpy(x))

        from mmde_tpu.nn.cnn_transformer import CnnTransformer
        fmodel = CnnTransformer(hidden_dim=256, n_enc_layers=2,
                                multi_scale=True, cnn_model="resnet18",
                                ff_dim=512)
        xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        variables = fmodel.init(jax.random.PRNGKey(0), xj)
        params, stats, report = tc.convert_cnn_transformer(
            _sd_numpy(tmodel), multi_scale=True)
        assert not [r for r in report if "unmapped" in r or "error" in r], report
        assert _paths(params) == _paths(variables["params"])
        assert _paths(stats) == _paths(variables["batch_stats"])

        (f_out,) = fmodel.apply(
            {"params": jax.tree.map(jnp.asarray, params),
             "batch_stats": jax.tree.map(jnp.asarray, stats)}, xj)
        f_out = np.transpose(np.asarray(f_out), (0, 3, 1, 2))
        np.testing.assert_allclose(
            f_out, t_out.numpy(), rtol=1e-4, atol=1e-4,
            err_msg="cnn_transformer multi-scale (ref cnn_transformer.py:251-263)")

    def test_forward_parity_resnet_only_single_scale(self):
        ref = _load_ref("resnet_only")
        args = types.SimpleNamespace(cnn_model="resnet50",
                                     transformer_ff_dim=512)
        tmodel = ref.resnet_only(args, hidden_dim=512,
                                 resnet_multi_scale=False)
        _randomize(tmodel, seed=1)
        tmodel.eval()

        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            (t_out,) = tmodel(torch.from_numpy(x))

        from mmde_tpu.nn.cnn_transformer import ResNetOnly
        fmodel = ResNetOnly(hidden_dim=512, multi_scale=False,
                            cnn_model="resnet50")
        xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        variables = fmodel.init(jax.random.PRNGKey(0), xj)
        params, stats, report = tc.convert_cnn_transformer(
            _sd_numpy(tmodel), multi_scale=False)
        assert not [r for r in report if "unmapped" in r or "error" in r], report
        assert _paths(params) == _paths(variables["params"])
        assert _paths(stats) == _paths(variables["batch_stats"])

        (f_out,) = fmodel.apply(
            {"params": jax.tree.map(jnp.asarray, params),
             "batch_stats": jax.tree.map(jnp.asarray, stats)}, xj)
        f_out = np.transpose(np.asarray(f_out), (0, 3, 1, 2))
        np.testing.assert_allclose(
            f_out, t_out.numpy(), rtol=1e-4, atol=1e-4,
            err_msg="resnet_only single-scale (ref resnet_only.py:152-168)")

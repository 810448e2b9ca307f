"""End-to-end pretrained loading through a real .pth file."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from mmde_tpu.config import ModelConfig, SwinConfig
from mmde_tpu.models import build_model
from mmde_tpu.train.step import init_model
from mmde_tpu.ckpt.pretrained import load_pretrained
from tests.test_torch_convert import TestSwinConvert


class TestLoadPretrainedSwin:
    def test_file_roundtrip_into_model(self, tmp_path):
        swin = SwinConfig(depths=(1, 1), window_size=(4, 4),
                          pretrain_window_size=(4, 4),
                          use_shift=(True, False), drop_path_rate=0.0)
        cfg = ModelConfig(backbone="swin_tiny_v2", decoder="decoder_v1",
                          model_scale=16, max_depth=10.0, swin=swin,
                          use_pallas_attention=False)
        model = build_model(cfg)
        f = jnp.zeros((1, 32, 32, 3))
        batch = {"image1": f, "image2": f}
        params, bs = init_model(model, jax.random.PRNGKey(0), batch)

        # synthesize a torch checkpoint matching the encoder params
        helper = TestSwinConvert()
        sd = helper._synthesize_torch_sd(
            jax.tree.map(np.asarray, dict(params["encoder"])))
        ckpt_path = tmp_path / "pretrained.pth"
        torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
                   str(ckpt_path))

        new_params, new_bs = load_pretrained(dict(params), dict(bs), cfg,
                                             str(ckpt_path), verbose=False)
        got = np.asarray(
            new_params["encoder"]["layers_0"]["blocks_0"]["attn"]["qkv"]["kernel"])
        expect = sd["layers.0.blocks.0.attn.qkv.weight"].T
        np.testing.assert_array_equal(got, expect)
        # decoder untouched
        np.testing.assert_array_equal(
            np.asarray(new_params["decoder"]["pose"]["conv0"]["kernel"]),
            np.asarray(params["decoder"]["pose"]["conv0"]["kernel"]))

    def test_missing_file_is_noop(self):
        cfg = ModelConfig(backbone="swin_tiny_v2")
        p = {"encoder": {"x": np.ones(3)}}
        out, _ = load_pretrained(p, {}, cfg, "/nonexistent/ckpt.pth",
                                 verbose=False)
        np.testing.assert_array_equal(out["encoder"]["x"], p["encoder"]["x"])

"""Weight-conversion mapping tests (no real checkpoints needed: synthesize
torch-style state dicts whose values are unique markers, convert, and check
every leaf lands in the right place with the right transform)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmde_tpu.ckpt import torch_convert as tc
from mmde_tpu.nn.swin_v2 import SwinTransformerV2
from mmde_tpu.nn.resnet import ResNetFeatures


class TestSwinConvert:
    @pytest.fixture(scope="class")
    def model_params(self):
        m = SwinTransformerV2(embed_dim=8, depths=(2, 2), num_heads=(2, 2),
                              window_size=(4, 4), pretrain_window_size=(4, 4),
                              use_shift=(True, False), out_indices=(1,),
                              drop_path_rate=0.0, rpe_hidden_dim=16)
        x = jnp.zeros((1, 16, 16, 3))
        v = m.init({"params": jax.random.PRNGKey(0)}, x, True)
        return m, v["params"]

    def test_full_coverage(self, model_params):
        """Every flax param must be fed by the synthesized torch dict."""
        _, params = model_params
        sd = self._synthesize_torch_sd(params)
        converted, report = tc.convert_swin(sd)
        merged, missing, unexpected = tc.apply_pretrained(
            jax.tree.map(np.asarray, jax.device_get(params)), converted)
        assert missing == [], missing[:10]
        assert unexpected == [], unexpected[:10]
        assert not [r for r in report if r.startswith("unmapped")], report[:10]

    def test_linear_transpose_and_values(self, model_params):
        _, params = model_params
        sd = self._synthesize_torch_sd(params)
        # poke one known tensor: qkv of stage 0 block 0
        qkv_t = sd["layers.0.blocks.0.attn.qkv.weight"]
        converted, _ = tc.convert_swin(sd)
        np.testing.assert_array_equal(
            converted["layers_0"]["blocks_0"]["attn"]["qkv"]["kernel"],
            qkv_t.T)

    def _synthesize_torch_sd(self, params):
        """Invert our naming to torch names, with correctly-shaped unique
        tensors (transposing back so conversion re-transposes)."""
        sd = {}
        counter = [0]

        def fresh(shape):
            counter[0] += 1
            return np.full(shape, float(counter[0]), np.float32)

        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            keys = [str(getattr(k, "key", k)) for k in path]
            shape = np.shape(leaf)
            name = None
            t = fresh(shape)
            if keys[0] == "patch_embed":
                if keys[1] == "proj":
                    name = f"patch_embed.proj.{'weight' if keys[2]=='kernel' else 'bias'}"
                    if keys[2] == "kernel":
                        t = np.transpose(t, (3, 2, 0, 1))
                else:
                    name = f"patch_embed.norm.{'weight' if keys[-1]=='scale' else 'bias'}"
            elif keys[0].startswith("norm"):
                name = f"{keys[0]}.{'weight' if keys[-1]=='scale' else 'bias'}"
            elif keys[0].startswith("layers_"):
                stage = keys[0].split("_")[1]
                if keys[1] == "downsample":
                    if keys[2] == "reduction":
                        name = f"layers.{stage}.downsample.reduction." \
                               f"{'weight' if keys[3]=='kernel' else 'bias'}"
                        if keys[3] == "kernel":
                            t = np.transpose(t)
                    else:
                        name = f"layers.{stage}.downsample.norm." \
                               f"{'weight' if keys[-1]=='scale' else 'bias'}"
                elif keys[1].startswith("blocks_"):
                    blk = keys[1].split("_")[1]
                    b = f"layers.{stage}.blocks.{blk}"
                    if keys[2] in ("norm1", "norm2", "enorm"):
                        name = f"{b}.{keys[2]}." \
                               f"{'weight' if keys[-1]=='scale' else 'bias'}"
                    elif keys[2] == "attn":
                        if keys[3] == "qkv":
                            name = f"{b}.attn.qkv.weight"
                            t = np.transpose(t)
                        elif keys[3] in ("q_bias", "v_bias", "logit_scale"):
                            name = f"{b}.attn.{keys[3]}"
                        elif keys[3] == "proj":
                            name = f"{b}.attn.proj." \
                                   f"{'weight' if keys[4]=='kernel' else 'bias'}"
                            if keys[4] == "kernel":
                                t = np.transpose(t)
                        elif keys[3] in ("rpe_fc1", "rpe_fc2"):
                            idx = "0" if keys[3] == "rpe_fc1" else "2"
                            name = f"{b}.attn.rpe_mlp.{idx}." \
                                   f"{'weight' if keys[4]=='kernel' else 'bias'}"
                            if keys[4] == "kernel":
                                t = np.transpose(t)
                    elif keys[2] == "mlp":
                        name = f"{b}.mlp.{keys[3]}." \
                               f"{'weight' if keys[4]=='kernel' else 'bias'}"
                        if keys[4] == "kernel":
                            t = np.transpose(t)
                    elif keys[2] in ("gamma_1", "gamma_2"):
                        name = f"{b}.{keys[2]}"
            assert name is not None, keys
            sd[name] = t
        return sd


class TestRpeInterp:
    def test_identity_when_same_window(self):
        rng = np.random.default_rng(0)
        t = rng.standard_normal((49, 4)).astype(np.float32)   # window 4
        out = tc.interpolate_rpe_table(t, 4, 4, "bicubic")
        np.testing.assert_allclose(out, t, atol=1e-5)

    def test_shapes_bicubic_and_geo(self):
        rng = np.random.default_rng(1)
        t = rng.standard_normal((23 * 23, 3)).astype(np.float32)  # window 12
        for mode in ("bicubic", "geo"):
            out = tc.interpolate_rpe_table(t, 12, 30, mode)
            assert out.shape == ((2 * 30 - 1) ** 2, 3)
            assert np.isfinite(out).all()

    def test_smooth_field_preserved(self):
        """A linear ramp must stay (nearly) a ramp under bicubic resampling."""
        s = 2 * 8 - 1
        xs = np.linspace(-1, 1, s)
        ramp = (xs[:, None] + xs[None, :]).reshape(-1, 1).astype(np.float32)
        out = tc.interpolate_rpe_table(ramp, 8, 16, "bicubic").reshape(31, 31)
        xd = np.linspace(-1, 1, 31)
        expect = xd[:, None] + xd[None, :]
        np.testing.assert_allclose(out, expect, atol=1e-3)


class TestResNetConvert:
    def test_resnet18_roundtrip(self):
        m = ResNetFeatures(model="resnet18", num_stages=4)
        x = jnp.zeros((1, 32, 32, 3))
        v = m.init({"params": jax.random.PRNGKey(0)}, x, False)
        tparams = v["params"]["trunk"] if "trunk" in v["params"] else v["params"]

        # synthesize torchvision-style dict
        sd = {}
        rng = np.random.default_rng(0)
        sd["conv1.weight"] = rng.standard_normal((64, 3, 7, 7)).astype(np.float32)
        for nm in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn1.{nm}"] = rng.standard_normal(64).astype(np.float32)
        depths = (2, 2, 2, 2)
        feats = [64, 128, 256, 512]
        in_c = 64
        for s_i, d in enumerate(depths):
            f = feats[s_i]
            for b in range(d):
                stride_in = in_c if b == 0 else f
                sd[f"layer{s_i+1}.{b}.conv1.weight"] = rng.standard_normal(
                    (f, stride_in, 3, 3)).astype(np.float32)
                sd[f"layer{s_i+1}.{b}.conv2.weight"] = rng.standard_normal(
                    (f, f, 3, 3)).astype(np.float32)
                for c in (1, 2):
                    for nm in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"layer{s_i+1}.{b}.bn{c}.{nm}"] = \
                            rng.standard_normal(f).astype(np.float32)
                if b == 0 and s_i > 0:
                    sd[f"layer{s_i+1}.{b}.downsample.0.weight"] = \
                        rng.standard_normal((f, in_c, 1, 1)).astype(np.float32)
                    for nm in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"layer{s_i+1}.{b}.downsample.1.{nm}"] = \
                            rng.standard_normal(f).astype(np.float32)
            in_c = f

        params, stats, report = tc.convert_resnet(sd)
        merged, missing, unexpected = tc.apply_pretrained(
            jax.tree.map(np.asarray, jax.device_get(tparams)), params)
        assert missing == [], missing[:8]
        # converted conv kernel matches HWIO transpose
        np.testing.assert_array_equal(
            merged["stem_conv"]["kernel"],
            np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))

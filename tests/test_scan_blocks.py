"""Scanned-stage (nn.scan over identical shift-free blocks) equivalence.

scan_blocks=True collapses a stage's D identical blocks into one compiled
body with a stacked (D, ...) param layout (swin_v2._ScanBlockCell). These
tests pin: (1) numerical equivalence with the unrolled layout under
converted params, (2) layout round-trip, (3) optimizer layer-decay /
weight-decay handling of stacked leaves.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mmde_tpu.nn import swin_v2 as sw
from mmde_tpu.train.optim import (build_layer_scales, swin_layer_id,
                                  weight_decay_mask)

KW = dict(embed_dim=96, depths=(4,), num_heads=(3,), window_size=(6,),
          drop_path_rate=0.0, out_indices=(0,), use_shift=False,
          pretrain_window_size=(6,), rpe_table_type="norm8_log_bylayer")


def _models():
    m_u = sw.SwinTransformerV2(scan_blocks=False, **KW)
    m_s = sw.SwinTransformerV2(scan_blocks=True, **KW)
    return m_u, m_s


def test_scan_forward_matches_unrolled():
    m_u, m_s = _models()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 48, 48, 3), jnp.float32)
    pu = m_u.init(jax.random.PRNGKey(1), x)
    ps = {"params": sw.to_scanned_layout(pu["params"], scan_stages=[0])}
    want = m_u.apply(pu, x)[0]
    got = m_s.apply(ps, x)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_scan_gradients_match_unrolled():
    m_u, m_s = _models()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 24, 3), jnp.float32)
    pu = m_u.init(jax.random.PRNGKey(1), x)
    ps = {"params": sw.to_scanned_layout(pu["params"], scan_stages=[0])}

    loss_u = lambda p: jnp.sum(m_u.apply(p, x)[0] ** 2)       # noqa: E731
    gu = jax.grad(loss_u)(pu)
    gu_jit = jax.jit(jax.grad(loss_u))(pu)
    gs = jax.grad(lambda p: jnp.sum(m_s.apply(p, x)[0] ** 2))(ps)
    gs_unrolled = {"params": sw.from_scanned_layout(gs["params"])}
    mu = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(gu)}
    mn = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(gu_jit)}
    ms = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(gs_unrolled)}
    assert set(mu) == set(ms)
    # scan reorders fp32 reductions, so compare by L2 per leaf against the
    # XLA path's OWN reordering noise (unrolled jit-vs-eager): several
    # leaves (logit_scale, proj bias) are near-cancelling sums where that
    # noise alone measures 10-74% relative. Same self-calibration as
    # tools/check_attention_grads_tpu.py.
    for k in mu:
        a = np.asarray(ms[k], np.float64)
        b = np.asarray(mu[k], np.float64)
        noise = np.linalg.norm(np.asarray(mn[k], np.float64) - b)
        err = np.linalg.norm(a - b)
        rel = err / (np.linalg.norm(b) + 1e-12)
        ok = rel < 2e-3 or err <= max(3.0 * noise, 1e-5)
        assert ok, f"{k}: rel L2 {rel:.2e}, err {err:.2e}, noise {noise:.2e}"


def test_layout_roundtrip():
    m_u, _ = _models()
    x = jnp.zeros((1, 24, 24, 3), jnp.float32)
    pu = m_u.init(jax.random.PRNGKey(1), x)["params"]
    ps = sw.to_scanned_layout(pu, scan_stages=[0])
    assert "blocks_scan" in ps["layers_0"]
    assert "blocks_0" not in ps["layers_0"]
    back = sw.from_scanned_layout(ps)
    flat_a = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(pu)}
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]))


def test_scan_droppath_training_smoke():
    # non-zero stochastic depth through the scanned path must run and give
    # a per-block split rng (no crash, output differs from deterministic)
    m_s = sw.SwinTransformerV2(scan_blocks=True, **{**KW,
                                                    "drop_path_rate": 0.5})
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 24, 24, 3), jnp.float32)
    ps = m_s.init(jax.random.PRNGKey(1), x)
    det = m_s.apply(ps, x, True)[0]
    tr = m_s.apply(ps, x, False,
                   rngs={"droppath": jax.random.PRNGKey(7)})[0]
    assert not np.allclose(np.asarray(det), np.asarray(tr))


def test_optimizer_scanned_layer_scales():
    m_u, m_s = _models()
    x = jnp.zeros((1, 24, 24, 3), jnp.float32)
    pu = m_u.init(jax.random.PRNGKey(1), x)["params"]
    ps = sw.to_scanned_layout(pu, scan_stages=[0])
    depths = (4,)
    rate = 0.9
    su, _ = build_layer_scales(pu, depths, rate)
    ss, _ = build_layer_scales(ps, depths, rate)
    # stacked leaf j must carry exactly the per-block scalar of blocks_j
    for j in range(4):
        ref = su[f"layers_0"][f"blocks_{j}"]["attn"]["qkv"]["kernel"]
        vec = ss["layers_0"]["blocks_scan"]["block"]["attn"]["qkv"]["kernel"]
        assert vec.shape[0] == 4 and vec.ndim == 3
        np.testing.assert_allclose(float(vec[j, 0, 0]), ref, rtol=1e-6)
    # layer ids: scanned path returns a ("scan", base) marker
    lid = swin_layer_id(("layers_0", "blocks_scan", "block"), [4], 7)
    assert lid == ("scan", 1)


def test_optimizer_scanned_weight_decay_mask():
    m_u, _ = _models()
    x = jnp.zeros((1, 24, 24, 3), jnp.float32)
    pu = m_u.init(jax.random.PRNGKey(1), x)["params"]
    ps = sw.to_scanned_layout(pu, scan_stages=[0])
    mask = weight_decay_mask(ps)
    blk = mask["layers_0"]["blocks_scan"]["block"]
    # stacked kernel (D, in, out) decays; stacked bias (D, out) must NOT
    assert bool(blk["attn"]["qkv"]["kernel"])
    assert not bool(blk["attn"]["q_bias"])
    assert not bool(blk["mlp"]["fc1"]["bias"])
    assert not bool(blk["attn"]["rpe_fc1"]["kernel"])   # NO_DECAY name
    assert bool(blk["mlp"]["fc1"]["kernel"])


def test_remat_policies_numerically_identical():
    """Rematerialization must never change values: loss and a gradient
    sample agree across full / attn_out / mlp_only (and no remat) on the
    same weights and batch. Guards the round-4 mlp_only default path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mmde_tpu.nn.swin_v2 import SwinTransformerV2

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3), jnp.float32)
    ref = None
    for use_ckpt, policy in ((False, "full"), (True, "full"),
                             (True, "attn_out"), (True, "mlp_only"),
                             (True, "none")):
        m = SwinTransformerV2(embed_dim=32, depths=(2,), num_heads=(2,),
                              window_size=(4,), pretrain_window_size=(4,),
                              use_shift=(True,), out_indices=(0,),
                              use_checkpoint=use_ckpt, remat_policy=policy,
                              attn_impl="xla")
        v = m.init(jax.random.PRNGKey(1), x, deterministic=True)

        def loss(params):
            f = m.apply({"params": params}, x, deterministic=True)
            return jnp.sum(f[0] ** 2)

        l, g = jax.value_and_grad(loss)(v["params"])
        gleaf = np.asarray(jax.tree_util.tree_leaves(g)[0])
        if ref is None:
            ref = (float(l), gleaf)
        else:
            np.testing.assert_allclose(float(l), ref[0], rtol=1e-6,
                                       err_msg=f"{use_ckpt}/{policy}")
            np.testing.assert_allclose(gleaf, ref[1], rtol=1e-5, atol=1e-6,
                                       err_msg=f"{use_ckpt}/{policy}")

"""Parity tests: packed-layout Pallas kernel vs the XLA reference path.

Runs in interpret mode on CPU (conftest forces JAX_PLATFORMS=cpu), so these
validate kernel logic, padding behavior, and the custom VJP everywhere.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmde_tpu.ops.window_attention import cosine_window_attention
from mmde_tpu.ops.window_attention_packed import (
    attention_plan, cosine_window_attention_packed, pack_rpe_bias)


def _make_inputs(B=6, nH=8, N=49, Dh=32, nW=3, with_mask=True, seed=0):
    C = nH * Dh
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    qkv = jax.random.normal(ks[0], (B, N, 3 * C), jnp.float32)
    ls = jax.random.normal(ks[1], (nH, 1, 1), jnp.float32) * 0.5 + 1.0
    bias = jax.random.normal(ks[2], (N, N, nH), jnp.float32)
    if with_mask:
        m = jax.random.bernoulli(ks[3], 0.3, (nW, N, N))
        mask = jnp.where(m, -100.0, 0.0).astype(jnp.float32)
    else:
        mask = None
    return qkv, ls, bias, mask


def _split_heads(qkv, nH):
    B, N, C3 = qkv.shape
    C = C3 // 3
    Dh = C // nH
    x = qkv.reshape(B, N, 3, nH, Dh).transpose(2, 0, 3, 1, 4)
    return x[0], x[1], x[2]


def _xla_ref(qkv, ls, bias_nnh, mask, nH):
    q, k, v = _split_heads(qkv, nH)
    bias = bias_nnh.transpose(2, 0, 1)
    out = cosine_window_attention(q, k, v, ls, bias, mask)
    B, _, N, Dh = out.shape
    return out.transpose(0, 2, 1, 3).reshape(B, N, nH * Dh)


def _packed(qkv, ls, bias_nnh, mask, nH, grid_mode=None):
    C = qkv.shape[-1] // 3
    Dh = C // nH
    _, Np, _, HG, nG, _ = attention_plan(qkv.shape[1], nH, Dh, C)
    bp = pack_rpe_bias(bias_nnh, nG, HG, Np)
    return cosine_window_attention_packed(qkv, ls, bp, mask, num_heads=nH,
                                          grid_mode=grid_mode)


GRIDS = ["window_resident", "bias_resident", "split"]


@pytest.mark.parametrize("grid", GRIDS)
@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("n", [36, 49])
def test_forward_matches_xla(with_mask, n, grid):
    qkv, ls, bias, mask = _make_inputs(N=n, with_mask=with_mask)
    want = _xla_ref(qkv, ls, bias, mask, nH=8)
    got = _packed(qkv, ls, bias, mask, nH=8, grid_mode=grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("grid", GRIDS)
def test_forward_qtiled_padded(grid):
    # N=500 > max BQ candidate: forces q tiling with Np > N padding.
    qkv, ls, bias, mask = _make_inputs(B=2, nH=4, N=500, nW=2)
    plan = attention_plan(500, 4, 32, 128)
    assert plan is not None and plan[2] > 1 and plan[1] > 500
    want = _xla_ref(qkv, ls, bias, mask, nH=4)
    got = _packed(qkv, ls, bias, mask, nH=4, grid_mode=grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("grid", GRIDS)
@pytest.mark.parametrize("with_mask", [False, True])
def test_gradients_match_xla(with_mask, grid):
    qkv, ls, bias, mask = _make_inputs(B=4, nH=4, N=49, nW=2,
                                       with_mask=with_mask)
    w = jax.random.normal(jax.random.PRNGKey(9), (49, 128), jnp.float32)

    def loss_packed(qkv, ls, bias):
        return jnp.sum(_packed(qkv, ls, bias, mask, nH=4,
                               grid_mode=grid) * w[None])

    def loss_xla(qkv, ls, bias):
        return jnp.sum(_xla_ref(qkv, ls, bias, mask, nH=4) * w[None])

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(qkv, ls, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(qkv, ls, bias)
    # ds dumps follow the input dtype (fp32 here), so dbias is an
    # exact-fp32 path like dqkv/dls.
    tols = {"dqkv": 2e-4, "dlogit_scale": 2e-4, "dbias": 2e-4}
    for a, b, name in zip(gp, gx, ["dqkv", "dlogit_scale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=tols[name], atol=tols[name],
                                   err_msg=name)


@pytest.mark.parametrize("with_mask", [False, True])
def test_multi_window_cells_match_xla(with_mask):
    # W>1 windows-per-cell (round 5; measured slower on TPU at flagship
    # shapes, default W=1 — docs/PERF.md) stays correct: one bias block
    # serves W k/v window blocks, mask blocks (W, BQ, Np) aligned by
    # W | nW.
    def packed_w(q, l, b):
        C = q.shape[-1] // 3
        _, Np, _, HG, nG, _ = attention_plan(q.shape[1], 8, C // 8, C)
        bp = pack_rpe_bias(b, nG, HG, Np)
        return cosine_window_attention_packed(q, l, bp, mask, num_heads=8,
                                              windows_per_cell=3)

    qkv, ls, bias, mask = _make_inputs(B=6, nH=8, N=49, nW=3,
                                       with_mask=with_mask)
    want = _xla_ref(qkv, ls, bias, mask, nH=8)
    got = packed_w(qkv, ls, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    w = jax.random.normal(jax.random.PRNGKey(9), (49, 256), jnp.float32)
    gp = jax.grad(lambda q, l, b: jnp.sum(
        packed_w(q, l, b) * w[None]), argnums=(0, 1, 2))(qkv, ls, bias)
    gx = jax.grad(lambda q, l, b: jnp.sum(
        _xla_ref(q, l, b, mask, nH=8) * w[None]), argnums=(0, 1, 2))(
        qkv, ls, bias)
    for a, b, name in zip(gp, gx, ["dqkv", "dlogit_scale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("grid", GRIDS)
def test_gradients_qtiled_padded(grid):
    qkv, ls, bias, mask = _make_inputs(B=2, nH=4, N=500, nW=2)

    def loss_packed(qkv, ls, bias):
        return jnp.sum(jnp.tanh(_packed(qkv, ls, bias, mask, nH=4,
                                        grid_mode=grid)))

    def loss_xla(qkv, ls, bias):
        return jnp.sum(jnp.tanh(_xla_ref(qkv, ls, bias, mask, nH=4)))

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(qkv, ls, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(qkv, ls, bias)
    tols = {"dqkv": 5e-4, "dlogit_scale": 5e-4, "dbias": 5e-4}
    for a, b, name in zip(gp, gx, ["dqkv", "dlogit_scale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=tols[name], atol=tols[name],
                                   err_msg=name)


def test_bias_grad_flows_to_packed_construction():
    # pack_rpe_bias is traced; its VJP must route dbias back to the (N,N,nH)
    # bias (and transitively to the RPE table MLP).
    qkv, ls, bias, _ = _make_inputs(B=2, nH=4, N=36, with_mask=False)

    def f(bias):
        return jnp.sum(_packed(qkv, ls, bias, None, nH=4) ** 2)

    g = jax.grad(f)(bias)
    assert g.shape == bias.shape
    assert bool(jnp.any(g != 0))


def test_plan_fallback_cases():
    assert attention_plan(49, 3, 32, 96) is None      # C % 128 != 0
    assert attention_plan(49, 8, 48, 384) is None     # 128 % Dh != 0
    bq, np_, nq, hg, ng, bq_b = attention_plan(900, 16, 32, 512)
    assert np_ % bq == 0 and np_ % bq_b == 0 and 900 <= np_ <= 960
    assert (hg, ng) == (4, 4) and bq >= 96 and np_ <= 960
    bq, np_, nq, hg, ng, bq_b = attention_plan(225, 32, 32, 1024)
    assert hg == 4 and ng == 8 and np_ % bq == 0 and np_ % bq_b == 0 and np_ >= 225


def test_bfloat16_smoke():
    qkv, ls, bias, mask = _make_inputs(B=2, nH=4, N=49, nW=2)
    want = _xla_ref(qkv, ls, bias, mask, nH=4)
    got = _packed(qkv.astype(jnp.bfloat16), ls, bias, mask, nH=4)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)


def test_swin_backbone_packed_vs_xla():
    """Full SwinV2 stack (shifted blocks + masks + PatchMerging) must be
    numerically identical between the XLA path and the packed Pallas path
    (which engages because embed_dim=128 -> C%128==0, Dh=32)."""
    from mmde_tpu.nn import swin_v2 as sw
    kw = dict(embed_dim=128, depths=(2,), num_heads=(4,), window_size=(6,),
              drop_path_rate=0.0, out_indices=(0,),
              pretrain_window_size=(6,), rpe_table_type="norm8_log_bylayer")
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 48, 48, 3), jnp.float32)
    m_x = sw.SwinTransformerV2(attn_impl="xla", **kw)
    m_p = sw.SwinTransformerV2(attn_impl="pallas", **kw)
    params = m_x.init(jax.random.PRNGKey(0), x)

    def out_x(p):
        return m_x.apply(p, x)[0]

    def out_p(p):
        return m_p.apply(p, x)[0]

    np.testing.assert_allclose(np.asarray(out_p(params)),
                               np.asarray(out_x(params)),
                               rtol=3e-5, atol=3e-5)
    # Grad tolerance note: through a 2-block stack with a squared loss the
    # fp32 XLA path itself deviates up to ~3e-4 absolute from an f64 ground
    # truth on near-zero params (exp-amplified round-off); the packed kernel
    # measures the same deviation, so compare at matching looseness.
    gp = jax.grad(lambda p: jnp.sum(out_p(p) ** 2))(params)
    gx = jax.grad(lambda p: jnp.sum(out_x(p) ** 2))(params)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_x = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gx)}
    for k, v in flat_p:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_x[ks]),
                                   rtol=5e-3, atol=2e-3, err_msg=ks)


class TestMxuBf16Mode:
    """bf16-MXU kernel mode (folded logit scale + bf16 dot operands, fp32
    accumulate/softmax) — default for bf16 inputs, never for fp32."""

    def _packed_mode(self, qkv, ls, bias, mask, nH, mxu):
        from mmde_tpu.ops.window_attention_packed import (
            attention_plan, cosine_window_attention_packed, pack_rpe_bias)
        plan = attention_plan(qkv.shape[1], nH, (qkv.shape[2] // 3) // nH,
                              qkv.shape[2] // 3)
        _, np_, _, hg, ng, _ = plan
        bp = pack_rpe_bias(bias, ng, hg, np_).astype(qkv.dtype)
        mk = mask.astype(qkv.dtype) if mask is not None else None
        return cosine_window_attention_packed(
            qkv, ls, bp, mk, num_heads=nH, interpret=True, mxu=mxu)

    def test_bf16_mode_close_to_fp32_pipeline(self):
        qkv, ls, bias, mask = _make_inputs(B=2, nH=4, N=36)
        qb = qkv.astype(jnp.bfloat16)
        o_ref = self._packed_mode(qb, ls, bias, mask, 4, mxu="fp32")
        o_mxu = self._packed_mode(qb, ls, bias, mask, 4, mxu="bf16")
        a = np.asarray(o_mxu, np.float32)
        b = np.asarray(o_ref, np.float32)
        # bf16 operand rounding on the two dots: ~0.4% relative
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)
        assert rel < 2e-2, rel
        assert o_mxu.dtype == jnp.bfloat16

    def test_fp32_inputs_never_use_bf16_mxu(self):
        # default resolution: fp32 in -> exact fp32 pipeline (bit-equal to
        # explicit mxu_bf16=False)
        qkv, ls, bias, mask = _make_inputs(B=2, nH=4, N=36)
        from mmde_tpu.ops.window_attention_packed import (
            attention_plan, cosine_window_attention_packed, pack_rpe_bias)
        plan = attention_plan(36, 4, 32, 128)
        _, np_, _, hg, ng, _ = plan
        bp = pack_rpe_bias(bias, ng, hg, np_)
        o_def = cosine_window_attention_packed(qkv, ls, bp, mask,
                                               num_heads=4, interpret=True)
        o_off = cosine_window_attention_packed(qkv, ls, bp, mask,
                                               num_heads=4, interpret=True,
                                               mxu="fp32")
        np.testing.assert_array_equal(np.asarray(o_def), np.asarray(o_off))

    def test_bf16_mode_grads_close(self):
        qkv, ls, bias, mask = _make_inputs(B=2, nH=4, N=36)
        qb = qkv.astype(jnp.bfloat16)

        def loss(q, l, b, mxu):
            o = self._packed_mode(q, l, b, mask, 4, mxu)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(qb, ls, bias, "fp32")
        for mode, tol in (("bf16", 5e-2), ("fold", 1e-2)):
            g_mxu = jax.grad(loss, argnums=(0, 1, 2))(qb, ls, bias, mode)
            for name, a, b in zip(("dqkv", "dls", "dbias"), g_mxu, g_ref):
                a = np.asarray(a, np.float32)
                b = np.asarray(b, np.float32)
                rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)
                assert rel < tol, (mode, name, rel)

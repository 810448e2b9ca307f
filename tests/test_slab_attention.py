"""Parity tests: v3 slab (map-in/map-out) kernel vs the XLA windowed path.

Interpret mode on CPU (conftest pins the platform), validating the dynamic
sublane window slicing, in-kernel (ws, ws, Dh) <-> (N, Dh) reshapes, the
grid-constant bias block, and the consecutive-revisit dbias accumulation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmde_tpu.nn.swin_v2 import window_partition, window_reverse
from mmde_tpu.ops.window_attention import cosine_window_attention
from mmde_tpu.ops.window_attention_slab import (
    cosine_window_attention_slab, pack_rpe_bias_slab, slab_plan)


def _make(B=2, nH=4, ws=6, nwh=2, nww=3, Dh=32, with_mask=True, seed=0):
    C = nH * Dh
    Hp, Wp = ws * nwh, ws * nww
    N = ws * ws
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    qkv = jax.random.normal(ks[0], (B, Hp, Wp, 3 * C), jnp.float32)
    ls = jax.random.normal(ks[1], (nH, 1, 1), jnp.float32) * 0.5 + 1.0
    bias = jax.random.normal(ks[2], (N, N, nH), jnp.float32)
    mask = None
    if with_mask:
        m = jax.random.bernoulli(ks[3], 0.3, (nwh * nww, N, N))
        mask = jnp.where(m, -100.0, 0.0).astype(jnp.float32)
    return qkv, ls, bias, mask, ws


def _xla_ref(qkv_map, ls, bias_nnh, mask, nH, ws):
    B, Hp, Wp, C3 = qkv_map.shape
    C = C3 // 3
    Dh = C // nH
    win = window_partition(qkv_map, ws)              # (B*nW, N, 3C)
    Bw, N, _ = win.shape
    x3 = win.reshape(Bw, N, 3, nH, Dh).transpose(2, 0, 3, 1, 4)
    out = cosine_window_attention(x3[0], x3[1], x3[2], ls,
                                  bias_nnh.transpose(2, 0, 1), mask)
    out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
    return window_reverse(out, ws, Hp, Wp)


def _slab(qkv_map, ls, bias_nnh, mask, nH, ws):
    C = qkv_map.shape[-1] // 3
    Dh = C // nH
    HG, nG = slab_plan(ws, qkv_map.shape[2], nH, Dh, C)
    bp = pack_rpe_bias_slab(bias_nnh, nG, HG)
    return cosine_window_attention_slab(qkv_map, ls, bp, mask,
                                        num_heads=nH, window_size=ws)


@pytest.mark.parametrize("with_mask", [False, True])
def test_forward_matches_xla(with_mask):
    qkv, ls, bias, mask, ws = _make(with_mask=with_mask)
    want = _xla_ref(qkv, ls, bias, mask, 4, ws)
    got = _slab(qkv, ls, bias, mask, 4, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_multi_group():
    # nH=8 -> two head groups; checks the channel-group block indexing
    qkv, ls, bias, mask, ws = _make(B=1, nH=8, nwh=1, nww=2)
    want = _xla_ref(qkv, ls, bias, mask, 8, ws)
    got = _slab(qkv, ls, bias, mask, 8, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_gradients_match_xla(with_mask):
    qkv, ls, bias, mask, ws = _make(B=2, nH=4, nwh=2, nww=2,
                                    with_mask=with_mask)

    def loss(fn):
        def f(qkv, ls, bias):
            return jnp.sum(jnp.tanh(fn(qkv, ls, bias, mask, 4, ws)))
        return f

    gs = jax.grad(loss(_slab), argnums=(0, 1, 2))(qkv, ls, bias)
    gx = jax.grad(loss(_xla_ref), argnums=(0, 1, 2))(qkv, ls, bias)
    tols = {"dqkv": 5e-4, "dls": 5e-4, "dbias": 5e-4}
    for a, b, name in zip(gs, gx, ["dqkv", "dls", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=tols[name], atol=tols[name],
                                   err_msg=name)


def test_plan_gates():
    assert slab_plan(6, 18, 3, 32, 96) is None        # C % 128 != 0
    assert slab_plan(6, 18, 4, 48, 192) is None       # 128 % Dh != 0
    assert slab_plan(30, 60, 16, 32, 512) == (4, 4)
    assert slab_plan(15, 30, 32, 32, 1024) == (4, 8)


def test_bfloat16_smoke():
    qkv, ls, bias, mask, ws = _make(B=1, nH=4, nwh=1, nww=2)
    want = _xla_ref(qkv, ls, bias, mask, 4, ws)
    got = _slab(qkv.astype(jnp.bfloat16), ls, bias, mask, 4, ws)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)

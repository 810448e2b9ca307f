"""Pallas fused window attention vs the XLA reference path.

Runs in interpret mode on the CPU test platform — same kernel logic that
compiles on TPU.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mmde_tpu.ops.window_attention import cosine_window_attention
from mmde_tpu.ops.window_attention_pallas import (
    cosine_window_attention_pallas)


def _inputs(B=6, nH=2, N=16, Dh=8, nW=3, with_mask=True, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, nH, N, Dh)).astype(np.float32)
    k = rng.standard_normal((B, nH, N, Dh)).astype(np.float32)
    v = rng.standard_normal((B, nH, N, Dh)).astype(np.float32)
    ls = (rng.standard_normal((nH, 1, 1)) * 0.5 + 2.0).astype(np.float32)
    bias = rng.standard_normal((nH, N, N)).astype(np.float32)
    mask = None
    if with_mask:
        mask = np.where(rng.random((nW, N, N)) < 0.2, -100.0, 0.0
                        ).astype(np.float32)
    return tuple(jnp.asarray(x) if x is not None else None
                 for x in (q, k, v, ls, bias, mask))


class TestPallasForward:
    def test_matches_xla_no_mask(self):
        q, k, v, ls, bias, _ = _inputs(with_mask=False)
        ours = cosine_window_attention_pallas(q, k, v, ls, bias, None)
        ref = cosine_window_attention(q, k, v, ls, bias, None)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_matches_xla_with_mask(self):
        q, k, v, ls, bias, mask = _inputs(with_mask=True)
        ours = cosine_window_attention_pallas(q, k, v, ls, bias, mask)
        ref = cosine_window_attention(q, k, v, ls, bias, mask)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_inputs(self):
        q, k, v, ls, bias, mask = _inputs()
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        ours = cosine_window_attention_pallas(qb, kb, vb, ls, bias, mask)
        assert ours.dtype == jnp.bfloat16
        ref = cosine_window_attention(qb, kb, vb, ls, bias, mask)
        np.testing.assert_allclose(
            np.asarray(ours, np.float32), np.asarray(ref, np.float32),
            rtol=5e-2, atol=5e-2)

    def test_large_window_padded_tiling(self):
        """N > 512 triggers the padded q-tiling path (e.g. window 30 ->
        N=900 in the flagship config); must still match XLA exactly."""
        q, k, v, ls, bias, mask = _inputs(B=2, nH=1, N=600, Dh=8, nW=2)
        ours = cosine_window_attention_pallas(q, k, v, ls, bias, mask)
        ref = cosine_window_attention(q, k, v, ls, bias, mask)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_under_jit(self):
        q, k, v, ls, bias, mask = _inputs()
        f = jax.jit(lambda *a: cosine_window_attention_pallas(*a, mask))
        np.testing.assert_allclose(
            np.asarray(f(q, k, v, ls, bias)),
            np.asarray(cosine_window_attention(q, k, v, ls, bias, mask)),
            rtol=1e-5, atol=1e-5)


class TestPallasGradients:
    def test_grads_match_xla(self):
        q, k, v, ls, bias, mask = _inputs(B=3, nW=3)

        def loss_pallas(q, k, v, ls, bias):
            return jnp.sum(
                cosine_window_attention_pallas(q, k, v, ls, bias, mask) ** 2)

        def loss_xla(q, k, v, ls, bias):
            return jnp.sum(
                cosine_window_attention(q, k, v, ls, bias, mask) ** 2)

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(q, k, v, ls, bias)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, v, ls, bias)
        # ds dumps follow the input dtype (fp32 here), so dbias is an
        # exact-fp32 path like the rest.
        tols = [(1e-4, 1e-5)] * 5
        for a, b, (rt, at) in zip(g1, g2, tols):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=rt, atol=at)

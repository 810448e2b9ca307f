"""On-hardware gradient check for the fused attention kernels.

The backward kernels rely on Pallas TPU output-block revisit semantics
(dbias accumulates across windows through flush/refetch cycles). Interpret
mode (CPU tests) models this, but the compiled Mosaic behavior is what
training actually uses — this script compares compiled-kernel gradients
against XLA autodiff on the real TPU at a realistic stage shape.

Usage: python tools/check_attention_grads_tpu.py [s1|s2|s3|s4]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mmde_tpu.ops.window_attention import cosine_window_attention
from mmde_tpu.ops.window_attention_pallas import cosine_window_attention_pallas
from mmde_tpu.ops.window_attention_packed import (
    attention_plan, cosine_window_attention_packed, pack_rpe_bias)
from tools.bench_attention import STAGES


def run(stage: str):
    name, B, nH, N, C, nW = STAGES[stage]
    # keep B a multiple of nW (the XLA mask path reshapes (B//nW, nW, ...))
    B = nW if nW else min(B, 8)
    Dh = C // nH
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    qkv = jax.random.normal(ks[0], (B, N, 3 * C), jnp.float32) * 0.5
    ls = jax.random.normal(ks[1], (nH, 1, 1), jnp.float32) * 0.3 + 1.0
    bias_nnh = jax.random.normal(ks[2], (N, N, nH), jnp.float32)
    mask = None
    if nW:
        m = jax.random.bernoulli(ks[3], 0.3, (nW, N, N))
        mask = jnp.where(m, -100.0, 0.0).astype(jnp.float32)

    _, Np, _, HG, nG, _ = attention_plan(N, nH, Dh, C)
    bias_hnn = bias_nnh.transpose(2, 0, 1)

    def split(qkv):
        x3 = qkv.reshape(B, N, 3, nH, Dh).transpose(2, 0, 3, 1, 4)
        return x3[0], x3[1], x3[2]

    def loss_xla(qkv, ls, bias_nnh):
        q, k, v = split(qkv)
        out = cosine_window_attention(q, k, v, ls,
                                      bias_nnh.transpose(2, 0, 1), mask)
        return jnp.sum(jnp.tanh(out))

    def loss_v1(qkv, ls, bias_nnh):
        q, k, v = split(qkv)
        out = cosine_window_attention_pallas(q, k, v, ls,
                                             bias_nnh.transpose(2, 0, 1),
                                             mask)
        return jnp.sum(jnp.tanh(out))

    def loss_packed(qkv, ls, bias_nnh):
        bp = pack_rpe_bias(bias_nnh, nG, HG, Np)
        out = cosine_window_attention_packed(qkv, ls, bp, mask, num_heads=nH)
        out = out.reshape(B, N, nH, Dh).transpose(0, 2, 1, 3)
        return jnp.sum(jnp.tanh(out.transpose(0, 2, 1, 3).reshape(B, N, C)))

    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(qkv, ls, bias_nnh)
    jax.block_until_ready(gx)
    print(f"-- {name} (B={B})")
    for label, fn in [("v1", loss_v1), ("packed", loss_packed)]:
        gp = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))(qkv, ls, bias_nnh)
        jax.block_until_ready(gp)
        ok = True
        for a, b, n_ in zip(gp, gx, ["dqkv", "dls", "dbias"]):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            rel = np.max(np.abs(a - b) / (np.abs(b) + 1e-4))
            status = "OK " if rel < 2e-3 else "BAD"
            ok &= rel < 2e-3
            print(f"   {label:7s} {n_:6s} maxrel={rel:.2e} {status}")
        if not ok:
            raise SystemExit(f"{label} gradient mismatch at {name}")


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print(f"backend={jax.default_backend()}")
    stages = [a for a in sys.argv[1:] if a in STAGES] or ["s2", "s3", "s4"]
    for s in stages:
        run(s)
    print("all gradient checks passed")

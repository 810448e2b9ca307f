"""Micro-benchmark: window-attention kernel generations on real TPU.

Compares, at swin-base stage shapes (480x640 two-frame bs4 => B_ windows):
  xla      — reference XLA implementation (head-split layout)
  pallas   — v1 fused head-split kernel
  packed   — v2 packed-layout kernel (qkv (B_, N, 3C), head-group blocks)

For the head-split impls the timing INCLUDES the layout work they impose on
the model (qkv 5-D transpose + output transpose), since the packed kernel
eliminates exactly that; all impls start from the Dense output (B_, N, 3C)
and end at (B_, N, C).

Usage: python tools/bench_attention.py [fwd|bwd] [stage...]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mmde_tpu.ops.window_attention import cosine_window_attention
from mmde_tpu.ops.window_attention_pallas import cosine_window_attention_pallas
from mmde_tpu.ops.window_attention_packed import (
    attention_plan, cosine_window_attention_packed, pack_rpe_bias)

# (name, B_windows, nH, N, C, nW_mask) — B_ for bs4 two-frame 480x640
STAGES = {
    "s1": ("stage1 120x180 w30", 48, 4, 900, 128, 24),
    "s2": ("stage2 60x90 w30", 24, 8, 900, 256, 6),
    "s3": ("stage3 30x60 w30", 16, 16, 900, 512, 0),
    "s4": ("stage4 15x30 w15", 16, 32, 225, 1024, 0),
}


def _time(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # remote-tunnel quirk: force a scalar fetch to really sync
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1e3


def bench_stage(key, mode, dtype=jnp.bfloat16):
    name, B, nH, N, C, nW = STAGES[key]
    Dh = C // nH
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    qkv = jax.random.normal(ks[0], (B, N, 3 * C), jnp.float32).astype(dtype)
    ls = jnp.full((nH, 1, 1), 1.0, jnp.float32)
    bias_nnh = jax.random.normal(ks[2], (N, N, nH), jnp.float32)
    mask = None
    if nW:
        m = jax.random.bernoulli(ks[3], 0.3, (nW, N, N))
        mask = jnp.where(m, -100.0, 0.0).astype(jnp.float32)

    plan = attention_plan(N, nH, Dh, C)
    _, Np, _, HG, nG, _ = plan
    bias_packed = pack_rpe_bias(bias_nnh, nG, HG, Np)
    bias_hnn = bias_nnh.transpose(2, 0, 1)

    def headsplit(fn):
        def run(qkv):
            x3 = qkv.reshape(B, N, 3, nH, Dh).transpose(2, 0, 3, 1, 4)
            out = fn(x3[0], x3[1], x3[2], ls, bias_hnn, mask)
            return out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return run

    impls = {
        "xla": headsplit(cosine_window_attention),
        "pallas": headsplit(cosine_window_attention_pallas),
        "packed": lambda qkv: cosine_window_attention_packed(
            qkv, ls, bias_packed, mask, num_heads=nH),
        "pk_split": lambda qkv: cosine_window_attention_packed(
            qkv, ls, bias_packed, mask, num_heads=nH, grid_mode="split"),
    }
    # bwd3 differentiates wrt (qkv, logit_scale, bias) — REQUIRED when
    # comparing dbias strategies: under grad-wrt-qkv-only XLA dead-code-
    # eliminates the dbias reduce (dump path) or the whole dbias pass
    # (split path), so plain bwd under-reports exactly the cost being
    # compared. Head-split impls take the (N, N, nH) bias, packed impls
    # the packed layout; grad sizes match across impls either way.
    impls3 = {
        "xla": lambda qkv, l, b: headsplit(
            functools.partial(_xla3, l, b))(qkv),
        "packed": lambda qkv, l, b: cosine_window_attention_packed(
            qkv, l, b, mask, num_heads=nH),
        "pk_split": lambda qkv, l, b: cosine_window_attention_packed(
            qkv, l, b, mask, num_heads=nH, grid_mode="split"),
    }

    print(f"-- {name}: B_={B} nH={nH} N={N} C={C} "
          f"{'mask' if nW else 'nomask'} {jnp.dtype(dtype).name}")
    results = {}
    for iname in (impls3 if mode == "bwd3" else impls):
        if mode == "fwd":
            g = jax.jit(impls[iname])
            argv = (qkv,)
        elif mode == "bwd3":
            f3 = impls3[iname]
            g = jax.jit(jax.grad(
                lambda q, l, b: jnp.sum(f3(q, l, b).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2)))
            argv = (qkv, ls, bias_hnn if iname == "xla" else bias_packed)
        else:
            f = impls[iname]
            g = jax.jit(jax.grad(lambda q: jnp.sum(f(q).astype(jnp.float32)
                                                   ** 2)))
            argv = (qkv,)
        try:
            ms = _time(g, *argv)
            results[iname] = ms
            print(f"   {iname:8s} {ms:8.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"   {iname:8s} FAILED: {str(e).splitlines()[0][:120]}")
    return results


def _xla3(ls, bias_hnn, q, k, v, ls_unused, bias_unused, mask):
    return cosine_window_attention(q, k, v, ls, bias_hnn, mask)


if __name__ == "__main__":
    from mmde_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"), min_compile_secs=5.0)
    args = sys.argv[1:]
    mode = args[0] if args and args[0] in ("fwd", "bwd", "bwd3") else "fwd"
    stages = [a for a in args if a in STAGES] or list(STAGES)
    print(f"backend={jax.default_backend()} mode={mode}")
    for s in stages:
        bench_stage(s, mode)

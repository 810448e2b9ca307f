"""Micro-benchmark: forward/backward kernel-body variants for the packed
window-attention kernel (docs/PERF.md roadmap item 1: fewer logits passes).

Variants (fwd):
  v0  current production body (s = c*scale + bias; s += mask; max; exp; sum)
  v1  scale folded into qn before the QK dot (one fewer logits pass; exact
      up to fp32 reassociation)
  v2  v1 + single-expression epilogue s = c + bias + mask (lets Mosaic fuse
      the adds into one traversal)
  v3  v2 + bf16 MXU inputs (qn/kn and p cast to bf16 before the dots,
      fp32 accumulate) — trades ~0.4% logit rounding for native-rate MXU
  v4  v3 + p stored bf16 for the PV matmul only (logits math fp32)

Backward variants mirror v0/v1/v3.

Usage: python tools/bench_attention_variants.py [s1|s2|s3|s4 ...]
Prints per-variant ms and max |diff| vs v0 (fp32 reference).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmde_tpu.ops.window_attention import MAX_LOGIT_SCALE
from mmde_tpu.ops.window_attention_packed import (attention_plan,
                                                  pack_rpe_bias)

# (name, B_windows, nH, N, C, nW_mask) — B_ for bs4 two-frame 480x640
STAGES = {
    "s1": ("stage1 120x180 w30", 48, 4, 900, 128, 24),
    "s2": ("stage2 60x90 w30", 24, 8, 900, 256, 6),
    "s3": ("stage3 30x60 w30", 16, 16, 900, 512, 0),
    "s4": ("stage4 15x30 w15", 16, 32, 225, 1024, 0),
}


def _fwd_body(ls_ref, qt_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref,
              *, hg, dh, np_, variant):
    g = pl.program_id(1)
    kbuf = k_ref[0]
    vbuf = v_ref[0]
    mask = mask_ref[0].astype(jnp.float32) if mask_ref is not None else None
    for t in range(hg):
        cs = t * dh
        q = qt_ref[0][:, cs:cs + dh].astype(jnp.float32)
        k = kbuf[:, cs:cs + dh].astype(jnp.float32)
        v = vbuf[:, cs:cs + dh].astype(jnp.float32)
        qn = q * jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True) + 1e-12)
        kn = k * jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + 1e-12)
        ls = ls_ref[g * hg + t, 0]
        scale = jnp.exp(jnp.minimum(ls, MAX_LOGIT_SCALE))
        bias = bias_ref[0][:, t * np_:(t + 1) * np_].astype(jnp.float32)

        if variant == 0:
            s = jax.lax.dot_general(qn, kn, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + bias
            if mask is not None:
                s = s + mask
        elif variant == 1:
            qs = qn * scale
            s = jax.lax.dot_general(qs, kn, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + bias
            if mask is not None:
                s = s + mask
        elif variant == 2:
            qs = qn * scale
            c = jax.lax.dot_general(qs, kn, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = (c + bias + mask) if mask is not None else (c + bias)
        elif variant in (3, 4):
            qs = (qn * scale).astype(jnp.bfloat16) if variant == 3 \
                else qn * scale
            kk = kn.astype(jnp.bfloat16) if variant == 3 else kn
            c = jax.lax.dot_general(qs, kk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = (c + bias + mask) if mask is not None else (c + bias)

        m = jnp.max(s, -1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, -1, keepdims=True)
        if variant in (3, 4):
            o = jax.lax.dot_general(p.astype(jnp.bfloat16),
                                    v.astype(jnp.bfloat16),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        else:
            o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        out_ref[0, :, cs:cs + dh] = (o / denom).astype(out_ref.dtype)


def forward(qkv, logit_scale, bias_packed, mask, num_heads, variant):
    B, N, C3 = qkv.shape
    C = C3 // 3
    nH = num_heads
    Dh = C // nH
    BQ, Np, nQ, HG, nG, _ = attention_plan(N, nH, Dh, C)
    CG = HG * Dh

    ls2 = logit_scale.reshape(nH, 1).astype(jnp.float32)
    if Np != N:
        qkv = jnp.pad(qkv, ((0, 0), (0, Np - N), (0, 0)))

    ls_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    qt_spec = pl.BlockSpec((1, BQ, CG), lambda b, g, iq: (b, iq, g))
    k_spec = pl.BlockSpec((1, Np, CG), lambda b, g, iq: (b, 0, nG + g))
    v_spec = pl.BlockSpec((1, Np, CG), lambda b, g, iq: (b, 0, 2 * nG + g))
    bias_spec = pl.BlockSpec((1, BQ, HG * Np), lambda b, g, iq: (g, iq, 0))
    in_specs = [ls_spec, qt_spec, k_spec, v_spec, bias_spec]
    args = [ls2, qkv, qkv, qkv, bias_packed]

    if mask is not None:
        nW = mask.shape[0]
        if mask.shape[1] != Np:
            mask = jnp.pad(mask, ((0, 0), (0, Np - mask.shape[1]),
                                  (0, Np - mask.shape[2])))
        in_specs.append(pl.BlockSpec((1, BQ, Np),
                                     lambda b, g, iq: (b % nW, iq, 0)))
        args.append(mask)
        body = functools.partial(_fwd_body, hg=HG, dh=Dh, np_=Np,
                                 variant=variant)
    else:
        def body(ls, qt, k, v, bias, out):
            _fwd_body(ls, qt, k, v, bias, None, out, hg=HG, dh=Dh, np_=Np,
                      variant=variant)

    out = pl.pallas_call(
        body,
        grid=(B, nG, nQ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BQ, CG), lambda b, g, iq: (b, iq, g)),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    return out[:, :N] if Np != N else out


def _time(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def bench_grids(keys):
    """Time the PRODUCTION packed kernel fwd and fwd+bwd in both grid
    orders (window_resident v2 vs bias_resident v4)."""
    from mmde_tpu.ops.window_attention_packed import (
        cosine_window_attention_packed)
    dtype = jnp.bfloat16
    for key in keys:
        name, B, nH, N, C, nW = STAGES[key]
        Dh = C // nH
        plan = attention_plan(N, nH, Dh, C)
        if plan is None:
            print(f"{key}: no packed plan, skipped")
            continue
        _, Np, _, HG, nG, _ = plan
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        qkv = jax.random.normal(ks[0], (B, N, 3 * C), jnp.float32).astype(dtype)
        ls = jnp.full((nH, 1, 1), 1.0, jnp.float32)
        bias_nnh = jax.random.normal(ks[2], (N, N, nH), jnp.float32)
        bias_packed = pack_rpe_bias(bias_nnh, nG, HG, Np).astype(dtype)
        mask = None
        if nW:
            m = (jax.random.uniform(ks[3], (nW, N, N)) < 0.2)
            mask = jnp.where(m, -100.0, 0.0).astype(dtype)

        print(f"== {key} {name}: B_={B} nH={nH} N={N} C={C} "
              f"mask={'y' if nW else 'n'}")
        for gm in ("window_resident", "bias_resident"):
            fwd = jax.jit(lambda q, l, b, m, gm=gm:
                          cosine_window_attention_packed(
                              q, l, b, m, num_heads=nH, grid_mode=gm))

            def loss(q, l, b, m, gm=gm):
                o = cosine_window_attention_packed(q, l, b, m,
                                                   num_heads=nH, grid_mode=gm)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            try:
                ms_f = _time(fwd, qkv, ls, bias_packed, mask)
                ms_g = _time(lambda *a: gfn(*a)[0], qkv, ls,
                             bias_packed, mask)
                print(f"  {gm:16s}: fwd {ms_f:7.3f} ms   fwd+bwd "
                      f"{ms_g:7.3f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"  {gm:16s}: FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:160]}")


def main():
    if "grids" in sys.argv[1:]:
        bench_grids([a for a in sys.argv[1:] if a in STAGES]
                    or ["s1", "s2", "s3", "s4"])
        return
    keys = [a for a in sys.argv[1:] if a in STAGES] or ["s1", "s3", "s4"]
    dtype = jnp.bfloat16
    for key in keys:
        name, B, nH, N, C, nW = STAGES[key]
        Dh = C // nH
        plan = attention_plan(N, nH, Dh, C)
        if plan is None:
            print(f"{key}: no packed plan, skipped")
            continue
        _, Np, _, HG, nG, _ = plan
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        qkv = jax.random.normal(ks[0], (B, N, 3 * C), jnp.float32).astype(dtype)
        ls = jnp.full((nH, 1, 1), 1.0, jnp.float32)
        bias_nnh = jax.random.normal(ks[2], (N, N, nH), jnp.float32)
        bias_packed = pack_rpe_bias(bias_nnh, nG, HG, Np).astype(dtype)
        mask = None
        if nW:
            m = (jax.random.uniform(ks[3], (nW, N, N)) < 0.2)
            mask = jnp.where(m, -100.0, 0.0).astype(dtype)

        print(f"== {key} {name}: B_={B} nH={nH} N={N} C={C} "
              f"mask={'y' if nW else 'n'}")
        ref = None
        for v in (0, 1, 2, 3, 4):
            fn = jax.jit(functools.partial(forward, num_heads=nH, variant=v))
            try:
                out = fn(qkv, ls, bias_packed, mask)
                out32 = np.asarray(out, np.float32)
                if ref is None:
                    ref = out32
                    diff = 0.0
                else:
                    diff = float(np.max(np.abs(out32 - ref)))
                ms = _time(fn, qkv, ls, bias_packed, mask)
                print(f"  v{v}: {ms:7.3f} ms   max|diff vs v0|={diff:.3e}")
            except Exception as e:  # noqa: BLE001
                print(f"  v{v}: FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()

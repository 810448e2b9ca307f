"""Packed-layout fused Pallas TPU kernel for SwinV2 cosine window attention.

Second-generation kernel (see window_attention_pallas.py for the head-split
v1). Motivation, from the measured step profile (docs/PERF.md): ~33% of the
train step was window bookkeeping — the (B_, N, 3, nH, Dh) qkv transpose,
the output (B_, nH, N, Dh) -> (B_, N, C) transpose, and the 4x HBM/VMEM
lane-padding waste of Dh=32-minor layouts ((…, N, 32) arrays tile to
(8, 128) lanes with 96 dead lanes).

This kernel consumes the qkv projection EXACTLY as the Dense layer produces
it — (B_, N, 3C), densely tiled — and writes attention output as (B_, N, C),
so the only ops between two Dense layers are this kernel plus window
partition/reverse.

Layout rules (probed on TPU, tools/probe_mosaic.py): block last dims must be
(8, 128)-divisible or full, so per-head 32-lane carving is illegal, but a
HEAD GROUP of HG = 128 // Dh heads spans exactly 128 lanes and is a legal
lane-carved block. Inside a cell we loop over the HG heads with STATIC
32-lane slices (legal). Grid: (B_, nG, nQ) — iq innermost so the k/v window
blocks stay resident across q tiles.

Operands per cell (window b, head-group g, q-tile iq):
  ls    (nH, 1)            SMEM, whole
  qt    (1, BQ, CG)        qkv[b, iq*BQ:, g*CG : (g+1)*CG]        CG = 128
  k     (1, Np, CG)        qkv[b, :, C + g*CG :]
  v     (1, Np, CG)        qkv[b, :, 2C + g*CG :]
  bias  (1, BQ, HG*Np)     packed (nG, Np, HG*Np), PRE-padded with -1e9
  mask  (1, BQ, Np)        optional (nW, Np, Np), window = b % nW
  out   (1, BQ, CG)

The RPE bias is packed head-group-major by `pack_rpe_bias` and padded at
construction time (no per-call pads); sigmoid*16 is applied on the small
(T, nH) table before Toeplitz expansion (elementwise-before-gather is
exact), not on the 13M-entry expanded bias.

Backward: one fused kernel, same grid. dq written once per (b, iq, g);
dk/dv accumulated across q tiles in the resident (1, Np, CG) output blocks
(normalize-VJP applied on the last tile); d(logit_scale) accumulated in
lane 0 of a never-flushed block. dbias is NOT accumulated in-kernel:
compiled Mosaic only supports output accumulation across CONSECUTIVE grid
steps (hardware-verified, tools/check_attention_grads_tpu.py — the revisit
pattern silently corrupts), so each cell dumps its per-window ds tile
(bf16, write-once) and the caller reduces dbias = sum over windows in XLA.
All gradients leave the kernel in packed layout — the caller only
concatenates [dq, dk, dv] to recover d(qkv).

Models with C % 128 != 0 or 128 % Dh != 0 (e.g. swin_tiny stage 1, C=96)
fall back to the v1 head-split kernel in the dispatcher.

Reference behavior being matched: cosine attention with clamped learned
log temperature, models/swin_transformer_v2.py:275-336 (reference repo).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmde_tpu.ops.window_attention import MAX_LOGIT_SCALE

_NEG_INF = -1e9
# Production grid order for the packed kernel (see _pallas_forward).
# "window_resident" is the measured-stable v2 (per-window ds dump +
# XLA window-sum for dbias); "split" keeps the v2 forward/grad grid but
# computes dbias in a SECOND, dbias-only pallas pass whose grid sweeps
# windows innermost so the fp32 dbias block accumulates across
# CONSECUTIVE grid steps (the hardware-safe pattern) with the bias block
# resident — deleting the (B_, nG, Np, HG*Np) ds-dump HBM write + re-read
# (~5 GB/step at flagship bs8). "bias_resident" is the v4 single-pass
# grid (slower, low-HBM opt-in). MMDE_ATTN_GRID overrides; read ONCE at
# import so jit caches can't depend on a mid-process env flip.
GRID_MODES = ("window_resident", "split", "bias_resident")
DEFAULT_GRID_MODE = os.environ.get("MMDE_ATTN_GRID", "window_resident")
if DEFAULT_GRID_MODE not in GRID_MODES:
    raise ValueError(
        f"MMDE_ATTN_GRID={DEFAULT_GRID_MODE!r} is not one of {GRID_MODES}; "
        "a typo here would silently fall through to window_resident")

# Default kernel-body precision mode for bf16 models ("fp32" exact, "fold"
# folded logit scale with fp32 dots, "bf16" fold + bf16 MXU operands).
# Measured e2e at flagship 480x640 bs8 (docs/PERF.md): fold 8.11 img/s,
# fp32 8.07-8.10, bf16 7.98 (the operand casts add VPU passes to a
# VPU-bound kernel) — "fold" is the default. Read ONCE at import so jit
# caches can't silently depend on a mid-process env flip;
# MMDE_ATTN_MXU=fp32 is the kill-switch.
_m = os.environ.get("MMDE_ATTN_MXU", "auto")
MXU_BF16_DEFAULT = "fold" if _m == "auto" else _m
del _m
# Max-free softmax (default on): cosine attention's logits are bounded —
# s = scale*cos + bias + mask with cos <= ~1, bias = 16*sigmoid in (0, 16),
# mask <= 0 — and every REAL query row contains its own diagonal
# (cos(q, q) = 1, diagonal never masked, bias >= 0), so row_max >= scale.
# A per-head STATIC shift of (scale + 16) therefore keeps the row max gap
# in [-16, ~0]: exp never overflows and the max entry stays >= exp(-16),
# so the per-row max reduction (a full (BQ, Np) VPU pass with a sequential
# dependency before the exp, in forward AND in the backward's recompute)
# can be deleted. Softmax is shift-invariant, so outputs and all gradient
# formulas are unchanged in exact math (d shift/d ls contributes 0 because
# ds rows sum to 0). All-pad q rows (bias -1e9, sliced off by the caller)
# underflow to p = 0; a tiny denominator guard turns them into 0 output
# instead of 0/0. MMDE_ATTN_SOFTMAX=max restores the per-row max pass.
_s = os.environ.get("MMDE_ATTN_SOFTMAX", "maxfree")
SOFTMAX_MAXFREE = _s != "max"
del _s
# Guard for all-pad rows; real rows have denom >= exp(-16) ~ 1.1e-7, so
# the guard's relative effect on them is < 1e-23.
_DENOM_GUARD = 1e-30
# Candidate q-tile row counts (all 8-divisible), large to small. Large tiles
# amortize per-cell grid overhead and the per-cell k/v re-normalization; the
# plan takes the largest that fits the VMEM budget with minimal padding.
_BQ_CANDIDATES = (456, 384, 304, 232, 152, 120, 80, 48, 40)
# Windows per grid cell (round 5) — BUILT, A/B-MEASURED, STAYS OFF.
# Theory: the roofline (tools/roofline.py) initially showed the kernels at
# 1.4x their no-overlap compute bound; packing W windows into one cell
# divides the per-window RPE-bias re-stream and the cell count by W (the
# cell loads W k/v window blocks — resident across q-tiles as before —
# against ONE bias block; masked stages need W | nW so a (W, BQ, Np) mask
# block covers aligned window types, window order being sample-major).
# Measured at bs8 flagship stages (docs/PERF.md round 5): W=2 412 ms,
# W=4 434 ms, auto(3/4) 451 ms vs 405 ms at W=1 — SLOWER at every W.
# Root cause of the apparent gap: a ~2.2 ms fixed per-DISPATCH floor in
# the measurement harness plus XLA-side reduce/concat time; corrected,
# the W=1 kernels already sit within 5-11% of their serial compute bound,
# so there was no bias-DMA stall to recover and fatter cells only eat
# Mosaic's double-buffering headroom. Default is W=1; MMDE_ATTN_W=auto/N
# keeps the machinery testable (read once at import so jit caches can't
# depend on a mid-process flip).
_w_env = os.environ.get("MMDE_ATTN_W", "1")
if _w_env != "auto":
    try:
        _ = int(_w_env)
    except ValueError:
        raise ValueError(f"MMDE_ATTN_W={_w_env!r} must be 'auto' or an int")
WINDOWS_PER_CELL = _w_env
del _w_env
_W_CANDIDATES = (8, 6, 4, 3, 2)
# Per-cell VMEM budgets (bytes). Tuned by on-hardware sweep (v5e): BQ=304
# tiles (these budgets) beat BQ=152 by ~25% on the backward and ~10% on the
# forward at w30 stages; larger tiles were noise-prone or mixed. The
# compiler's default vmem cap is raised via vmem_limit_bytes below — the
# hardware has more VMEM than the conservative default allows.
_VMEM_BUDGET_FWD = 16 * 1024 * 1024
_VMEM_BUDGET_BWD = 24 * 1024 * 1024


def _cell_vmem(bq: int, np_: int, hg: int, bwd: bool) -> int:
    """Rough per-cell VMEM estimate: double-buffered bias blocks + fp32
    logits temporaries + k/v window blocks + mask; bwd adds the bf16 ds-dump
    block and fp32 dk/dv accumulators."""
    bias = bq * hg * np_ * 4 * 2
    logits = (3 if not bwd else 5) * bq * np_ * 4
    kv = 2 * np_ * 128 * 2 * 2
    mask = bq * np_ * 4 * 2
    extra = 0
    if bwd:
        extra = bq * hg * np_ * 2 * 2       # ds dump block (bf16)
        extra += 2 * np_ * 128 * 4 * 2      # dk/dv fp32 blocks
    return bias + logits + kv + mask + extra


def _cell_vmem_w(bq: int, np_: int, hg: int, bwd: bool, w: int,
                 masked: bool) -> int:
    """Per-cell VMEM estimate for a W-window cell: one double-buffered bias
    block + fp32 logits temporaries (sequential per window, unscaled) +
    W copies of the per-window working set."""
    bias = bq * hg * np_ * 4 * 2
    logits = (3 if not bwd else 5) * bq * np_ * 4
    per_w = 2 * np_ * 128 * 2 * 2          # k/v blocks
    if masked:
        per_w += bq * np_ * 4 * 2          # mask block
    per_w += 3 * bq * 128 * 4              # q / out (/ g) tiles
    if bwd:
        per_w += bq * hg * np_ * 2 * 2     # ds dump block
        per_w += 2 * np_ * 128 * 4 * 2     # dk/dv accumulators
    return bias + logits + w * per_w


# W-cell budgets are LARGER than the per-window budgets (the whole point is
# fatter cells; v5e has 128 MB VMEM and vmem_limit_bytes is raised to
# 100 MB below). Tuned by on-hardware A/B (docs/PERF.md round 5).
_VMEM_BUDGET_FWD_W = 40 * 1024 * 1024
_VMEM_BUDGET_BWD_W = 48 * 1024 * 1024


def _choose_w(B: int, nW: int, bq: int, np_: int, hg: int,
              bwd: bool, override=None) -> int:
    """Windows per cell: largest candidate dividing B (and nW when a mask
    is present, nW > 0) whose W-cell fits the W budget. 1 = the round-4
    layout. `override`: explicit per-call setting ("auto"/int), else the
    module default (MMDE_ATTN_W)."""
    setting = WINDOWS_PER_CELL if override is None else str(override)
    if setting != "auto":
        w = int(setting)
        if w <= 1 or B % w or (nW and nW % w):
            return 1
        return w
    budget = _VMEM_BUDGET_BWD_W if bwd else _VMEM_BUDGET_FWD_W
    for w in _W_CANDIDATES:
        if B % w or (nW and nW % w):
            continue
        if _cell_vmem_w(bq, np_, hg, bwd, w, masked=nW > 0) <= budget:
            return w
    return 1


def _largest_fitting_divisor(np_: int, hg: int, bwd: bool) -> int:
    """Largest 8-multiple divisor of Np whose cell fits the VMEM budget."""
    budget = _VMEM_BUDGET_BWD if bwd else _VMEM_BUDGET_FWD
    best = 8
    for d in range(8, np_ + 1, 8):
        if np_ % d == 0 and _cell_vmem(d, np_, hg, bwd) <= budget:
            best = d
    return best


def attention_plan(n: int, num_heads: int, head_dim: int, channels: int):
    """(BQ_fwd, Np, nQ_fwd, HG, nG, BQ_bwd) or None when the packed layout
    is unusable (C not 128-divisible / Dh not dividing 128).

    Np is shared between forward and backward (the packed bias is laid out
    at Np); the backward gets its own, usually smaller, q tile because its
    cells carry dbias/dk/dv blocks on top of the forward's working set.
    Large tiles are preferred over minimal padding (up to 8% pad) — many
    small cells cost more in grid sequencing and re-normalization than the
    padded rows do.
    """
    if channels % 128 != 0 or 128 % head_dim != 0:
        return None
    hg = 128 // head_dim
    if num_heads % hg != 0:
        return None
    ng = num_heads // hg

    if n <= max(_BQ_CANDIDATES):
        np_ = -(-n // 8) * 8
        bq = np_ if _cell_vmem(np_, np_, hg, False) <= _VMEM_BUDGET_FWD else \
            _largest_fitting_divisor(np_, hg, False)
        return bq, np_, np_ // bq, hg, ng, \
            _largest_fitting_divisor(np_, hg, True)

    best = None          # (bq, np_, nq), preferring big tiles at pad <= 8%
    fallback = None      # minimal padding, any fitting tile
    for bq in _BQ_CANDIDATES:
        nq = -(-n // bq)
        np_ = nq * bq
        if _cell_vmem(bq, np_, hg, False) > _VMEM_BUDGET_FWD:
            continue
        if best is None and np_ <= int(n * 1.08):
            best = (bq, np_, nq)
        if fallback is None or np_ < fallback[1] or (
                np_ == fallback[1] and bq > fallback[0]):
            fallback = (bq, np_, nq)
    chosen = best or fallback
    if chosen is None:
        return None
    bq, np_, nq = chosen
    return bq, np_, nq, hg, ng, _largest_fitting_divisor(np_, hg, True)


def pack_rpe_bias(bias_nnh: jnp.ndarray, ng: int, hg: int,
                  np_pad: int) -> jnp.ndarray:
    """(N, N, nH) bias -> (nG, Np, HG*Np) packed + key-padded with -1e9.

    Padded key columns (and rows) carry -1e9 so padded tokens never win the
    softmax; padded q rows are garbage that the caller slices off.
    """
    n = bias_nnh.shape[0]
    b = bias_nnh.reshape(n, n, ng, hg)
    b = b.transpose(2, 0, 3, 1)                      # (nG, N, HG, N)
    pad = np_pad - n
    if pad:
        b = jnp.pad(b, ((0, 0), (0, pad), (0, 0), (0, pad)),
                    constant_values=_NEG_INF)
    return b.reshape(ng, np_pad, hg * np_pad)


def _fwd_body(ls_ref, qt_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref,
              rden_ref=None, *, hg: int, dh: int, np_: int, g_axis: int = 1,
              mxu: str = "fp32", w: int = 1):
    """mxu: "fp32" — exact fp32 pipeline (fp32 models; tested bit-stable);
    "fold" — fold the logit scale into q before the QK dot (one fewer
    (BQ, Np) logits pass; fp32 dots); "bf16" — fold + run the two matmuls
    with bf16 operands (fp32 accumulate) for native-rate MXU at ~0.4% logit
    rounding (bf16 models only — their operands are already bf16-rounded).
    The backward recomputes p with the SAME ops so forward and backward see
    identical probabilities. w: windows per cell — the bias block is loaded
    once and reused for all w windows (see _W_CANDIDATES note)."""
    fold = mxu in ("fold", "bf16")
    use_b = mxu == "bf16"
    g = pl.program_id(g_axis)
    for wi in range(w):
        kbuf = k_ref[wi]
        vbuf = v_ref[wi]
        mask = (mask_ref[wi].astype(jnp.float32)
                if mask_ref is not None else None)
        for t in range(hg):
            cs = t * dh
            q = qt_ref[wi][:, cs:cs + dh].astype(jnp.float32)
            k = kbuf[:, cs:cs + dh].astype(jnp.float32)
            v = vbuf[:, cs:cs + dh].astype(jnp.float32)
            qn = q * jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True) + 1e-12)
            kn = k * jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + 1e-12)
            ls = ls_ref[g * hg + t, 0]
            scale = jnp.exp(jnp.minimum(ls, MAX_LOGIT_SCALE))
            if fold:
                qd = qn * scale
                kd = kn
                if use_b:
                    qd = qd.astype(jnp.bfloat16)
                    kd = kd.astype(jnp.bfloat16)
                s = jax.lax.dot_general(qd, kd, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s + bias_ref[0][:, t * np_:(t + 1) * np_].astype(
                    jnp.float32)
            else:
                s = jax.lax.dot_general(qn, kn, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s * scale + bias_ref[0][:, t * np_:(t + 1) * np_].astype(
                    jnp.float32)
            if mask is not None:
                s = s + mask
            if SOFTMAX_MAXFREE:
                p = jnp.exp(s - (scale + 16.0))
                denom = jnp.sum(p, -1, keepdims=True) + _DENOM_GUARD
            else:
                m = jnp.max(s, -1, keepdims=True)
                p = jnp.exp(s - m)
                denom = jnp.sum(p, -1, keepdims=True)
            if use_b:
                o = jax.lax.dot_general(p.astype(jnp.bfloat16),
                                        v.astype(jnp.bfloat16),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            else:
                o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            out_ref[wi, :, cs:cs + dh] = (o / denom).astype(out_ref.dtype)
            if rden_ref is not None:
                # reciprocal denominators for the backward (softmax-
                # denominator save, maxfree mode): the bwd forms
                # p = exp(s - shift) * r instead of re-reducing the
                # (BQ, Np) row sums. The forward OUTPUT keeps the o/denom
                # division above bit-for-bit.
                rden_ref[0, wi, :, t:t + 1] = 1.0 / denom


def _pad_rows(x, np_, value=0.0):
    n = x.shape[1]
    if np_ == n:
        return x
    return jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)), constant_values=value)


def _pallas_forward(qkv, logit_scale, bias_packed, mask, num_heads,
                    interpret, grid_mode="window_resident",
                    mxu="fp32", want_denom=False, wpc=None):
    """grid_mode:
      "window_resident" (v2): grid (B, nG, nQ), iq innermost — the k/v
        window blocks stay resident across q tiles, the RPE bias block is
        re-streamed for every window (BQ*HG*Np bytes per cell).
      "bias_resident" (v4): grid (nG, nQ, B), b innermost — the bias block
        stays resident across ALL windows (read ~once per layer instead of
        once per window); k/v stream per cell instead. The bias block is
        ~5x the k/v pair at flagship shapes, so this cuts per-cell HBM
        traffic ~2x. Same math, same outputs."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    nH = num_heads
    Dh = C // nH
    BQ, Np, nQ, HG, nG, _ = attention_plan(N, nH, Dh, C)
    CG = HG * Dh

    ls2 = logit_scale.reshape(nH, 1).astype(jnp.float32)
    qkv = _pad_rows(qkv, Np)
    if mask is not None and mask.shape[1] != Np:
        mask = jnp.pad(mask, ((0, 0), (0, Np - mask.shape[1]),
                              (0, Np - mask.shape[2])))
    nW = mask.shape[0] if mask is not None else 0

    if grid_mode == "bias_resident":
        W = 1
        grid = (nG, nQ, B)
        g_axis = 0
        qt_idx = lambda g, iq, b: (b, iq, g)                  # noqa: E731
        k_idx = lambda g, iq, b: (b, 0, nG + g)               # noqa: E731
        v_idx = lambda g, iq, b: (b, 0, 2 * nG + g)           # noqa: E731
        bias_idx = lambda g, iq, b: (g, iq, 0)                # noqa: E731
        mask_idx = lambda g, iq, b: (b % nW, iq, 0)           # noqa: E731
        rden_idx = lambda g, iq, b: (g, b, iq, 0)             # noqa: E731
    else:
        # W windows per cell: block shapes carry W on the window axis; the
        # index lambdas are unchanged because block indices are in units
        # of the block shape (cell b covers windows b*W .. b*W + W - 1).
        W = _choose_w(B, nW if mask is not None else 0, BQ, Np, HG,
                      bwd=False, override=wpc)
        grid = (B // W, nG, nQ)
        g_axis = 1
        qt_idx = lambda b, g, iq: (b, iq, g)                  # noqa: E731
        k_idx = lambda b, g, iq: (b, 0, nG + g)               # noqa: E731
        v_idx = lambda b, g, iq: (b, 0, 2 * nG + g)           # noqa: E731
        bias_idx = lambda b, g, iq: (g, iq, 0)                # noqa: E731
        # mask block (W, BQ, Np): W divides nW (guaranteed by _choose_w)
        # and windows are sample-major, so cell b covers the aligned mask
        # rows (b % (nW/W)) * W .. + W - 1
        mask_idx = lambda b, g, iq: (b % (nW // W), iq, 0) if nW else 0  # noqa: E731,E501
        rden_idx = lambda b, g, iq: (g, b, iq, 0)             # noqa: E731

    ls_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    qt_spec = pl.BlockSpec((W, BQ, CG), qt_idx)
    k_spec = pl.BlockSpec((W, Np, CG), k_idx)
    v_spec = pl.BlockSpec((W, Np, CG), v_idx)
    bias_spec = pl.BlockSpec((1, BQ, HG * Np), bias_idx)
    in_specs = [ls_spec, qt_spec, k_spec, v_spec, bias_spec]
    args = [ls2, qkv, qkv, qkv, bias_packed]

    if mask is not None:
        in_specs.append(pl.BlockSpec((W, BQ, Np), mask_idx))
        args.append(mask)
        if want_denom:
            body = functools.partial(_fwd_body, hg=HG, dh=Dh, np_=Np,
                                     g_axis=g_axis, mxu=mxu, w=W)
        else:
            def body(ls, qt, k, v, bias, msk, out):
                _fwd_body(ls, qt, k, v, bias, msk, out, None,
                          hg=HG, dh=Dh, np_=Np, g_axis=g_axis, mxu=mxu, w=W)
    else:
        if want_denom:
            def body(ls, qt, k, v, bias, out, rden):
                _fwd_body(ls, qt, k, v, bias, None, out, rden,
                          hg=HG, dh=Dh, np_=Np, g_axis=g_axis, mxu=mxu, w=W)
        else:
            def body(ls, qt, k, v, bias, out):
                _fwd_body(ls, qt, k, v, bias, None, out, None,
                          hg=HG, dh=Dh, np_=Np, g_axis=g_axis, mxu=mxu, w=W)

    out_specs = pl.BlockSpec((W, BQ, CG), qt_idx)
    out_shapes = jax.ShapeDtypeStruct((B, Np, C), qkv.dtype)
    if want_denom:
        # reciprocal row denominators, (nG, B, Np, HG) fp32 — the head
        # group on the LEADING axis so the lane dimension (HG) is the full
        # final array dim (Mosaic requires lane blocks be full-dim or
        # 128-divisible); block (1, W, BQ, HG) per grid cell
        out_specs = (out_specs,
                     pl.BlockSpec((1, W, BQ, HG), rden_idx))
        out_shapes = (out_shapes,
                      jax.ShapeDtypeStruct((nG, B, Np, HG), jnp.float32))

    outs = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
        if not interpret else None,
    )(*args)
    if want_denom:
        out, rden = outs
        return (out[:, :N] if Np != N else out), rden
    out = outs
    return out[:, :N] if Np != N else out


def _bwd_body(ls_ref, qt_ref, k_ref, v_ref, bias_ref, mask_ref, rden_ref,
              gt_ref, dq_ref, dk_ref, dv_ref, ds_ref, dls_ref,
              *, hg: int, dh: int, np_: int, mxu: str = "fp32", w: int = 1):
    """Backward cell. Correctness constraint (measured on hardware,
    tools/check_attention_grads_tpu.py): compiled Mosaic only supports
    output-block accumulation across CONSECUTIVE grid steps, so dk/dv
    accumulate over iq (innermost) and dbias is NOT accumulated in-kernel —
    each cell dumps its ds tile (write-once) and the caller reduces over
    windows in XLA. The dls block's index never changes, so it is never
    flushed and accumulates safely across all cells. `mxu` as in
    _fwd_body; `w` = windows per cell (one bias load serves all w)."""
    fold = mxu in ("fold", "bf16")
    use_b = mxu == "bf16"
    b = pl.program_id(0)
    g = pl.program_id(1)
    iq = pl.program_id(2)
    first_iq = iq == 0
    last_iq = iq == pl.num_programs(2) - 1
    first_cell = jnp.logical_and(
        b == 0, jnp.logical_and(g == 0, first_iq))

    @pl.when(first_cell)
    def _():
        dls_ref[:, :] = jnp.zeros(dls_ref.shape, jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    for wi in range(w):
        kbuf = k_ref[wi]
        vbuf = v_ref[wi]
        mask = (mask_ref[wi].astype(jnp.float32)
                if mask_ref is not None else None)

        for t in range(hg):
            cs = t * dh
            q = qt_ref[wi][:, cs:cs + dh].astype(jnp.float32)
            k = kbuf[:, cs:cs + dh].astype(jnp.float32)
            v = vbuf[:, cs:cs + dh].astype(jnp.float32)
            gr = gt_ref[wi][:, cs:cs + dh].astype(jnp.float32)

            rq = jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True) + 1e-12)
            rk = jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + 1e-12)
            qn = q * rq
            kn = k * rk

            ls = ls_ref[g * hg + t, 0]
            scale = jnp.exp(jnp.minimum(ls, MAX_LOGIT_SCALE))
            if fold:
                # recompute p with the forward's exact ops (folded scale,
                # and bf16 MXU operands in "bf16" mode) so fwd/bwd p agree
                qd = qn * scale
                kd = kn
                if use_b:
                    qd = qd.astype(jnp.bfloat16)
                    kd = kd.astype(jnp.bfloat16)
                sc = jax.lax.dot_general(qd, kd, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                s = sc + bias_ref[0][:, t * np_:(t + 1) * np_].astype(
                    jnp.float32)
            else:
                c = jax.lax.dot_general(qn, kn, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                sc = c * scale
                s = sc + bias_ref[0][:, t * np_:(t + 1) * np_].astype(
                    jnp.float32)
            if mask is not None:
                s = s + mask
            if rden_ref is not None:
                # softmax-denominator save (maxfree only): the forward's
                # reciprocal row sums are residuals, so the (BQ, Np)
                # re-reduce and the division both collapse to one
                # broadcast multiply. p differs from the recompute path by
                # <= 1 ulp (x*(1/d) vs x/d); gradients carry
                # fp32-noise-level changes only.
                p = jnp.exp(s - (scale + 16.0)) * rden_ref[0, wi][:, t:t + 1]
            elif SOFTMAX_MAXFREE:
                p = jnp.exp(s - (scale + 16.0))
                p = p / (jnp.sum(p, -1, keepdims=True) + _DENOM_GUARD)
            else:
                m = jnp.max(s, -1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, -1, keepdims=True)

            if use_b:
                grd = gr.astype(jnp.bfloat16)
                dp = jax.lax.dot_general(grd, v.astype(jnp.bfloat16),
                                         (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            else:
                dp = jax.lax.dot_general(gr, v, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, -1, keepdims=True))

            if use_b:
                dv_part = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), grd, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                dv_part = jax.lax.dot_general(
                    p, gr, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(first_iq)
            def _():
                dv_ref[wi, :, cs:cs + dh] = dv_part.astype(dv_ref.dtype)

            @pl.when(jnp.logical_not(first_iq))
            def _():
                dv_ref[wi, :, cs:cs + dh] = (
                    dv_ref[wi, :, cs:cs + dh].astype(jnp.float32)
                    + dv_part).astype(dv_ref.dtype)

            if ds_ref is not None:
                # per-window ds dump (write-once); dbias = sum_b outside
                ds_ref[wi, 0, :, t * np_:(t + 1) * np_] = ds.astype(
                    ds_ref.dtype)

            gate = (ls < MAX_LOGIT_SCALE).astype(jnp.float32)
            # d(loss)/d(ls) = sum(ds * scale * qn.kn) = sum(ds * sc)
            dls_val = jnp.sum(ds * sc) * gate
            dls_ref[pl.ds(g * hg + t, 1), :] += jnp.where(lane == 0,
                                                          dls_val, 0.0)

            if use_b:
                dsd = ds.astype(jnp.bfloat16)
                dqn = scale * jax.lax.dot_general(
                    dsd, kd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                dqn = scale * jax.lax.dot_general(
                    ds, kn, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            dq = rq * (dqn - qn * jnp.sum(dqn * qn, -1, keepdims=True))
            dq_ref[wi, :, cs:cs + dh] = dq.astype(dq_ref.dtype)

            if fold:
                # qd carries the folded scale: dot(ds, qd) = scale * ds.qn
                dkn_part = jax.lax.dot_general(
                    dsd if use_b else ds, qd, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                dkn_part = scale * jax.lax.dot_general(
                    ds, qn, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(first_iq)
            def _():
                dk_ref[wi, :, cs:cs + dh] = dkn_part.astype(dk_ref.dtype)

            @pl.when(jnp.logical_not(first_iq))
            def _():
                dk_ref[wi, :, cs:cs + dh] = (
                    dk_ref[wi, :, cs:cs + dh].astype(jnp.float32)
                    + dkn_part).astype(dk_ref.dtype)

            @pl.when(last_iq)
            def _():
                dkn = dk_ref[wi, :, cs:cs + dh].astype(jnp.float32)
                dk_ref[wi, :, cs:cs + dh] = (rk * (
                    dkn - kn * jnp.sum(dkn * kn, -1, keepdims=True))
                ).astype(dk_ref.dtype)


def _bwd_body_v4(ls_ref, qt_ref, k_ref, v_ref, bias_ref, mask_ref, gt_ref,
                 dq_ref, dkp_ref, dvp_ref, dbias_ref, dls_ref,
                 *, hg: int, dh: int, np_: int):
    """Bias-resident backward cell: grid (nG, nQ, B), b innermost.

    dbias accumulates IN-KERNEL in fp32: its block index (g, iq) is fixed
    while b sweeps, so revisits are CONSECUTIVE grid steps — the
    hardware-verified-legal accumulation pattern (same one dk/dv used over
    iq in the window-resident grid). This removes the (B_, nG, Np, HG*Np)
    per-window ds dump (~0.6 GB HBM write + read at flagship stage-1 bs8)
    and makes RPE-bias gradients exact fp32 sums for every model dtype.
    dk/dv can no longer accumulate in-kernel (their (b, g) blocks are
    revisited non-consecutively across iq), so each cell dumps its raw
    dkn/dv partials per q-tile — (nQ, B, Np, C), ~5x smaller than the ds
    dump — and the caller reduces over iq and applies the k-normalize VJP
    in XLA. dls accumulates in a never-flushed block as before."""
    g = pl.program_id(0)
    iq = pl.program_id(1)
    b = pl.program_id(2)
    first_b = b == 0
    first_cell = jnp.logical_and(
        jnp.logical_and(g == 0, iq == 0), first_b)

    @pl.when(first_cell)
    def _():
        dls_ref[:, :] = jnp.zeros(dls_ref.shape, jnp.float32)

    kbuf = k_ref[0]
    vbuf = v_ref[0]
    mask = mask_ref[0].astype(jnp.float32) if mask_ref is not None else None
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    for t in range(hg):
        cs = t * dh
        q = qt_ref[0][:, cs:cs + dh].astype(jnp.float32)
        k = kbuf[:, cs:cs + dh].astype(jnp.float32)
        v = vbuf[:, cs:cs + dh].astype(jnp.float32)
        gr = gt_ref[0][:, cs:cs + dh].astype(jnp.float32)

        rq = jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True) + 1e-12)
        rk = jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + 1e-12)
        qn = q * rq
        kn = k * rk

        ls = ls_ref[g * hg + t, 0]
        scale = jnp.exp(jnp.minimum(ls, MAX_LOGIT_SCALE))
        c = jax.lax.dot_general(qn, kn, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = c * scale + bias_ref[0][:, t * np_:(t + 1) * np_].astype(
            jnp.float32)
        if mask is not None:
            s = s + mask
        if SOFTMAX_MAXFREE:
            p = jnp.exp(s - (scale + 16.0))
            p = p / (jnp.sum(p, -1, keepdims=True) + _DENOM_GUARD)
        else:
            m = jnp.max(s, -1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, -1, keepdims=True)

        dp = jax.lax.dot_general(gr, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, -1, keepdims=True))

        dvp_ref[0, 0, :, cs:cs + dh] = jax.lax.dot_general(
            p, gr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dvp_ref.dtype)

        @pl.when(first_b)
        def _():
            dbias_ref[0, :, t * np_:(t + 1) * np_] = ds

        @pl.when(jnp.logical_not(first_b))
        def _():
            dbias_ref[0, :, t * np_:(t + 1) * np_] += ds

        gate = (ls < MAX_LOGIT_SCALE).astype(jnp.float32)
        dls_val = scale * jnp.sum(ds * c) * gate
        dls_ref[pl.ds(g * hg + t, 1), :] += jnp.where(lane == 0, dls_val, 0.0)

        dqn = scale * jax.lax.dot_general(ds, kn, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        dq = rq * (dqn - qn * jnp.sum(dqn * qn, -1, keepdims=True))
        dq_ref[0, :, cs:cs + dh] = dq.astype(dq_ref.dtype)

        # raw dkn partial (pre normalize-VJP; scale folded in) — the caller
        # sums over iq and applies the kn projection outside
        dkp_ref[0, 0, :, cs:cs + dh] = (scale * jax.lax.dot_general(
            ds, qn, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(dkp_ref.dtype)


def _cell_vmem_bwd_v4(bq: int, np_: int, hg: int) -> int:
    """v4 backward cell: resident bias + fp32 dbias accumulator dominate;
    k/v stream per cell; dk/dv partial dump blocks replace the ds dump."""
    bias = bq * hg * np_ * 4 * 2
    dbias = bq * hg * np_ * 4 * 2
    logits = 5 * bq * np_ * 4
    kv = 2 * np_ * 128 * 2 * 2
    mask = bq * np_ * 4 * 2
    dumps = 2 * np_ * 128 * 4 * 2
    qt = 3 * bq * 128 * 4 * 2
    return bias + dbias + logits + kv + mask + dumps + qt


def _pallas_backward_v4(qkv, logit_scale, bias_packed, mask, g_out,
                        num_heads, interpret):
    B, N, C3 = qkv.shape
    C = C3 // 3
    nH = num_heads
    Dh = C // nH
    _, Np, _, HG, nG, _ = attention_plan(N, nH, Dh, C)
    CG = HG * Dh

    BQ = 8
    for d in range(8, Np + 1, 8):
        if Np % d == 0 and _cell_vmem_bwd_v4(d, Np, HG) <= _VMEM_BUDGET_BWD:
            BQ = d
    nQ = Np // BQ

    ls2 = logit_scale.reshape(nH, 1).astype(jnp.float32)
    qkv = _pad_rows(qkv, Np)
    g_out = _pad_rows(g_out, Np)

    ls_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    qt_spec = pl.BlockSpec((1, BQ, CG), lambda g, iq, b: (b, iq, g))
    k_spec = pl.BlockSpec((1, Np, CG), lambda g, iq, b: (b, 0, nG + g))
    v_spec = pl.BlockSpec((1, Np, CG), lambda g, iq, b: (b, 0, 2 * nG + g))
    bias_spec = pl.BlockSpec((1, BQ, HG * Np), lambda g, iq, b: (g, iq, 0))
    in_specs = [ls_spec, qt_spec, k_spec, v_spec, bias_spec]
    args = [ls2, qkv, qkv, qkv, bias_packed]

    if mask is not None:
        nW = mask.shape[0]
        if mask.shape[1] != Np:
            mask = jnp.pad(mask, ((0, 0), (0, Np - mask.shape[1]),
                                  (0, Np - mask.shape[2])))
        in_specs.append(pl.BlockSpec((1, BQ, Np),
                                     lambda g, iq, b: (b % nW, iq, 0)))
        args.append(mask)
        body = functools.partial(_bwd_body_v4, hg=HG, dh=Dh, np_=Np)
    else:
        def body(ls, qt, k, v, bias, gt, dq, dkp, dvp, dbias, dls):
            _bwd_body_v4(ls, qt, k, v, bias, None, gt, dq, dkp, dvp,
                         dbias, dls, hg=HG, dh=Dh, np_=Np)
    in_specs.append(qt_spec)                # g tile
    args.append(g_out)

    gdt = qkv.dtype
    out_shapes = (
        jax.ShapeDtypeStruct((B, Np, C), gdt),                  # dq
        jax.ShapeDtypeStruct((nQ, B, Np, C), gdt),              # dkn partials
        jax.ShapeDtypeStruct((nQ, B, Np, C), gdt),              # dv partials
        jax.ShapeDtypeStruct(bias_packed.shape, jnp.float32),   # dbias
        jax.ShapeDtypeStruct((nH, 128), jnp.float32),           # dls
    )
    out_specs = (
        pl.BlockSpec((1, BQ, CG), lambda g, iq, b: (b, iq, g)),
        pl.BlockSpec((1, 1, Np, CG), lambda g, iq, b: (iq, b, 0, g)),
        pl.BlockSpec((1, 1, Np, CG), lambda g, iq, b: (iq, b, 0, g)),
        pl.BlockSpec((1, BQ, HG * Np), lambda g, iq, b: (g, iq, 0)),
        pl.BlockSpec((nH, 128), lambda g, iq, b: (0, 0)),
    )

    dq, dkp, dvp, dbias, dls = pl.pallas_call(
        body,
        grid=(nG, nQ, B),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
        if not interpret else None,
    )(*args)

    dv = jnp.sum(dvp.astype(jnp.float32), axis=0)
    dkn = jnp.sum(dkp.astype(jnp.float32), axis=0)
    # k-normalize VJP, moved out of the kernel: dk = rk*(dkn - kn<dkn,kn>)
    k = qkv[:, :, C:2 * C].astype(jnp.float32).reshape(B, Np, nH, Dh)
    dkn = dkn.reshape(B, Np, nH, Dh)
    rk = jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + 1e-12)
    kn = k * rk
    dk = rk * (dkn - kn * jnp.sum(dkn * kn, -1, keepdims=True))

    dqkv = jnp.concatenate(
        [dq, dk.reshape(B, Np, C).astype(gdt),
         dv.astype(gdt)], axis=-1)[:, :N]
    dls_out = dls[:, 0].reshape(logit_scale.shape).astype(logit_scale.dtype)
    return dqkv, dls_out, dbias.astype(bias_packed.dtype)


def _cell_vmem_dbias(bq: int, np_: int, hg: int) -> int:
    """dbias-only pass: RESIDENT bias block + fp32 dbias accumulator
    (single-buffered — their block index is constant while the inner grid
    axes sweep), streamed k/v + q/g tiles + fp32 logits temporaries."""
    bias = bq * hg * np_ * 4
    dbias = bq * hg * np_ * 4
    logits = 4 * bq * np_ * 4
    kv = 2 * np_ * 128 * 2 * 2
    mask = bq * np_ * 4 * 2
    qt = 2 * bq * 128 * 4 * 2
    return bias + dbias + logits + kv + mask + qt


def _dbias_body(ls_ref, qt_ref, k_ref, v_ref, bias_ref, mask_ref, gt_ref,
                dbias_ref, *, hg: int, dh: int, np_: int, mxu: str,
                inner_axes: tuple):
    """dbias-only backward cell. The grid puts the window/sample axes
    INNERMOST so the (g, iq)-indexed dbias block is revisited on
    consecutive grid steps — the only accumulation pattern compiled Mosaic
    supports (docs/PERF.md hardware audit) — and the bias input block is
    resident (read once per (g, iq), not once per window). p is recomputed
    with the forward's exact ops (same mxu mode) so gradients match the
    dump-based path."""
    fold = mxu in ("fold", "bf16")
    use_b = mxu == "bf16"
    g = pl.program_id(0)
    first = pl.program_id(inner_axes[0]) == 0
    for ax in inner_axes[1:]:
        first = jnp.logical_and(first, pl.program_id(ax) == 0)

    kbuf = k_ref[0]
    vbuf = v_ref[0]
    mask = mask_ref[0].astype(jnp.float32) if mask_ref is not None else None
    for t in range(hg):
        cs = t * dh
        q = qt_ref[0][:, cs:cs + dh].astype(jnp.float32)
        k = kbuf[:, cs:cs + dh].astype(jnp.float32)
        v = vbuf[:, cs:cs + dh].astype(jnp.float32)
        gr = gt_ref[0][:, cs:cs + dh].astype(jnp.float32)
        qn = q * jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True) + 1e-12)
        kn = k * jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + 1e-12)
        ls = ls_ref[g * hg + t, 0]
        scale = jnp.exp(jnp.minimum(ls, MAX_LOGIT_SCALE))
        if fold:
            qd = qn * scale
            kd = kn
            if use_b:
                qd = qd.astype(jnp.bfloat16)
                kd = kd.astype(jnp.bfloat16)
            s = jax.lax.dot_general(qd, kd, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        else:
            s = scale * jax.lax.dot_general(qn, kn, (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
        s = s + bias_ref[0][:, t * np_:(t + 1) * np_].astype(jnp.float32)
        if mask is not None:
            s = s + mask
        if SOFTMAX_MAXFREE:
            p = jnp.exp(s - (scale + 16.0))
            p = p / (jnp.sum(p, -1, keepdims=True) + _DENOM_GUARD)
        else:
            m = jnp.max(s, -1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, -1, keepdims=True)
        if use_b:
            dp = jax.lax.dot_general(gr.astype(jnp.bfloat16),
                                     v.astype(jnp.bfloat16),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        else:
            dp = jax.lax.dot_general(gr, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, -1, keepdims=True))

        @pl.when(first)
        def _():
            dbias_ref[0, :, t * np_:(t + 1) * np_] = ds

        @pl.when(jnp.logical_not(first))
        def _():
            dbias_ref[0, :, t * np_:(t + 1) * np_] += ds


def _pallas_dbias(qkv, logit_scale, bias_packed, mask, g_out, num_heads,
                  interpret, mxu="fp32"):
    """dbias = sum over all windows of ds, accumulated in-kernel (fp32).

    Grid: (nG, nQ, B) with the window axis innermost — or, when a SW-MSA
    mask is present, (nG, nQ, nW, B/nW) so the mask block (indexed by the
    window-type axis) is also resident across the per-sample sweep
    (window partition lays windows out sample-major: b = s*nW + w)."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    nH = num_heads
    Dh = C // nH
    _, Np, _, HG, nG, _ = attention_plan(N, nH, Dh, C)
    CG = HG * Dh

    BQ = 8
    for d in range(8, Np + 1, 8):
        if Np % d == 0 and _cell_vmem_dbias(d, Np, HG) <= _VMEM_BUDGET_BWD:
            BQ = d
    nQ = Np // BQ

    ls2 = logit_scale.reshape(nH, 1).astype(jnp.float32)
    qkv = _pad_rows(qkv, Np)
    g_out = _pad_rows(g_out, Np)

    ls_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    if mask is not None:
        nW = mask.shape[0]
        if mask.shape[1] != Np:
            mask = jnp.pad(mask, ((0, 0), (0, Np - mask.shape[1]),
                                  (0, Np - mask.shape[2])))
        # The (nG, nQ, nW, S) grid enumerates windows as b = s*nW + w; if
        # B were not a multiple of nW the last B - S*nW windows would be
        # silently DROPPED from dbias (dq/dk/dv still cover them). The
        # model's window partition guarantees divisibility — fail loudly
        # if that invariant is ever violated.
        if B % nW != 0:
            raise ValueError(
                f"_pallas_dbias masked grid needs B % nW == 0 "
                f"(B={B}, nW={nW}); gradients would be silently wrong")
        S = B // nW
        grid = (nG, nQ, nW, S)
        inner_axes = (2, 3)
        bi = lambda g, iq, w, s: (s * nW + w, iq, g)          # noqa: E731
        qt_spec = pl.BlockSpec((1, BQ, CG), bi)
        k_spec = pl.BlockSpec((1, Np, CG),
                              lambda g, iq, w, s: (s * nW + w, 0, nG + g))
        v_spec = pl.BlockSpec((1, Np, CG),
                              lambda g, iq, w, s: (s * nW + w, 0, 2 * nG + g))
        bias_spec = pl.BlockSpec((1, BQ, HG * Np),
                                 lambda g, iq, w, s: (g, iq, 0))
        mask_spec = pl.BlockSpec((1, BQ, Np), lambda g, iq, w, s: (w, iq, 0))
        dbias_spec = pl.BlockSpec((1, BQ, HG * Np),
                                  lambda g, iq, w, s: (g, iq, 0))
        in_specs = [ls_spec, qt_spec, k_spec, v_spec, bias_spec, mask_spec,
                    qt_spec]
        args = [ls2, qkv, qkv, qkv, bias_packed, mask, g_out]
        body = functools.partial(_dbias_body, hg=HG, dh=Dh, np_=Np, mxu=mxu,
                                 inner_axes=inner_axes)
    else:
        grid = (nG, nQ, B)
        inner_axes = (2,)
        qt_spec = pl.BlockSpec((1, BQ, CG), lambda g, iq, b: (b, iq, g))
        k_spec = pl.BlockSpec((1, Np, CG), lambda g, iq, b: (b, 0, nG + g))
        v_spec = pl.BlockSpec((1, Np, CG),
                              lambda g, iq, b: (b, 0, 2 * nG + g))
        bias_spec = pl.BlockSpec((1, BQ, HG * Np),
                                 lambda g, iq, b: (g, iq, 0))
        dbias_spec = pl.BlockSpec((1, BQ, HG * Np),
                                  lambda g, iq, b: (g, iq, 0))
        in_specs = [ls_spec, qt_spec, k_spec, v_spec, bias_spec, qt_spec]
        args = [ls2, qkv, qkv, qkv, bias_packed, g_out]

        def body(ls, qt, k, v, bias, gt, dbias):
            _dbias_body(ls, qt, k, v, bias, None, gt, dbias,
                        hg=HG, dh=Dh, np_=Np, mxu=mxu, inner_axes=inner_axes)

    dbias = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=dbias_spec,
        out_shape=jax.ShapeDtypeStruct(bias_packed.shape, jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=100 * 1024 * 1024)
        if not interpret else None,
    )(*args)
    return dbias.astype(bias_packed.dtype)


def _pallas_backward(qkv, logit_scale, bias_packed, mask, g_out, num_heads,
                     interpret, mxu="fp32", dump_ds=True, rden=None,
                     wpc=None):
    B, N, C3 = qkv.shape
    C = C3 // 3
    nH = num_heads
    Dh = C // nH
    BQf, Np, _, HG, nG, BQ = attention_plan(N, nH, Dh, C)
    nQ = Np // BQ
    CG = HG * Dh

    ls2 = logit_scale.reshape(nH, 1).astype(jnp.float32)
    qkv = _pad_rows(qkv, Np)
    g_out = _pad_rows(g_out, Np)

    nW_m = mask.shape[0] if mask is not None else 0
    W = _choose_w(B, nW_m, BQ, Np, HG, bwd=True, override=wpc)

    ls_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    qt_spec = pl.BlockSpec((W, BQ, CG), lambda b, g, iq: (b, iq, g))
    k_spec = pl.BlockSpec((W, Np, CG), lambda b, g, iq: (b, 0, nG + g))
    v_spec = pl.BlockSpec((W, Np, CG), lambda b, g, iq: (b, 0, 2 * nG + g))
    bias_spec = pl.BlockSpec((1, BQ, HG * Np), lambda b, g, iq: (g, iq, 0))
    in_specs = [ls_spec, qt_spec, k_spec, v_spec, bias_spec]
    args = [ls2, qkv, qkv, qkv, bias_packed]

    if mask is not None:
        nW = mask.shape[0]
        if mask.shape[1] != Np:
            mask = jnp.pad(mask, ((0, 0), (0, Np - mask.shape[1]),
                                  (0, Np - mask.shape[2])))
        # (W, BQ, Np) block: W | nW (enforced by _choose_w), windows are
        # sample-major, so cell b covers aligned mask rows
        in_specs.append(pl.BlockSpec(
            (W, BQ, Np), lambda b, g, iq: (b % (nW // W), iq, 0)))
        args.append(mask)
    if rden is not None:
        # fwd's reciprocal row denominators, (nG, B, Np, HG); the fwd may
        # tile rows/windows differently (its own BQ and W) but writes
        # every row once, so the bwd's (1, W, BQ, HG) blocks line up on
        # the same array.
        in_specs.append(pl.BlockSpec((1, W, BQ, HG),
                                     lambda b, g, iq: (g, b, iq, 0)))
        args.append(rden)

    has_mask = mask is not None
    has_rden = rden is not None

    def body(*refs):
        ls, qt, k, v, bias = refs[:5]
        i = 5
        msk = refs[i] if has_mask else None
        i += 1 if has_mask else 0
        rd = refs[i] if has_rden else None
        i += 1 if has_rden else 0
        gt = refs[i]
        outs = refs[i + 1:]
        if dump_ds:
            dq, dk, dv, ds, dls = outs
        else:
            dq, dk, dv, dls = outs
            ds = None
        _bwd_body(ls, qt, k, v, bias, msk, rd, gt, dq, dk, dv, ds, dls,
                  hg=HG, dh=Dh, np_=Np, mxu=mxu, w=W)
    in_specs.append(qt_spec)                # g tile
    args.append(g_out)

    # dq/dk/dv leave the kernel in the input dtype: for bf16 models this
    # halves the gradient-output traffic and kills the downstream cast.
    # dk/dv accumulate across the nQ q-tiles inside the output buffer, so
    # bf16 adds ~0.4%*sqrt(nQ) relative rounding — bf16-training noise
    # (fp32 models keep exact fp32 accumulation; tests run fp32).
    gdt = qkv.dtype
    out_shapes = [
        jax.ShapeDtypeStruct((B, Np, C), gdt),                  # dq
        jax.ShapeDtypeStruct((B, Np, C), gdt),                  # dk
        jax.ShapeDtypeStruct((B, Np, C), gdt),                  # dv
    ]
    out_specs = [
        pl.BlockSpec((W, BQ, CG), lambda b, g, iq: (b, iq, g)),
        pl.BlockSpec((W, Np, CG), lambda b, g, iq: (b, 0, g)),
        pl.BlockSpec((W, Np, CG), lambda b, g, iq: (b, 0, g)),
    ]
    if dump_ds:
        # per-window ds tiles (write-once); reduced to dbias in XLA below,
        # in the INPUT dtype: fp32 models get exact fp32 RPE-bias grads,
        # bf16 models keep the halved ds_all HBM traffic (the window sum
        # still happens in fp32; only per-window partials are rounded,
        # ~0.4% relative — within bf16 gradient noise). NOTE the transient
        # ds_all HBM peak: (B_, nG, Np, HG*Np) ≈ 1.3 GB bf16 at flagship
        # stage-1 shapes (B_=192, Np=912) before the XLA reduction.
        # grid_mode="split" avoids both the dump and the peak.
        out_shapes.append(
            jax.ShapeDtypeStruct((B,) + bias_packed.shape, gdt))
        out_specs.append(
            pl.BlockSpec((W, 1, BQ, HG * Np), lambda b, g, iq: (b, g, iq, 0)))
    out_shapes.append(jax.ShapeDtypeStruct((nH, 128), jnp.float32))  # dls
    out_specs.append(pl.BlockSpec((nH, 128), lambda b, g, iq: (0, 0)))

    outs = pl.pallas_call(
        body,
        grid=(B // W, nG, nQ),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
        if not interpret else None,
    )(*args)
    if dump_ds:
        dq, dk, dv, ds_all, dls = outs
    else:
        dq, dk, dv, dls = outs
        ds_all = None

    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)[:, :N]
    dls_out = dls[:, 0].reshape(logit_scale.shape).astype(logit_scale.dtype)
    if not dump_ds:
        return dqkv, dls_out, None
    dbias = jnp.sum(ds_all.astype(jnp.float32), axis=0)
    return dqkv, dls_out, dbias.astype(bias_packed.dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:                                   # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _packed_op(qkv, logit_scale, bias_packed, mask, num_heads, interpret,
               grid_mode, mxu, wpc):
    return _pallas_forward(qkv, logit_scale, bias_packed, mask, num_heads,
                           interpret, grid_mode, mxu, wpc=wpc)


def _packed_fwd(qkv, logit_scale, bias_packed, mask, num_heads, interpret,
                grid_mode, mxu, wpc):
    # maxfree softmax: also emit the reciprocal row denominators so the
    # backward skips its (BQ, Np) softmax re-reduce (tiny residual:
    # (B_, Np, nH) fp32). The v4 bias_resident backward keeps its own
    # exact-fp32 pipeline and ignores them.
    want = SOFTMAX_MAXFREE and grid_mode != "bias_resident"
    if want:
        out, rden = _pallas_forward(qkv, logit_scale, bias_packed, mask,
                                    num_heads, interpret, grid_mode, mxu,
                                    want_denom=True, wpc=wpc)
    else:
        out = _pallas_forward(qkv, logit_scale, bias_packed, mask,
                              num_heads, interpret, grid_mode, mxu,
                              wpc=wpc)
        rden = None
    return out, (qkv, logit_scale, bias_packed, mask, rden)


def _packed_bwd(num_heads, interpret, grid_mode, mxu, wpc, res, g):
    qkv, logit_scale, bias_packed, mask, rden = res
    if grid_mode == "bias_resident":
        # v4 opt-in keeps the exact fp32 backward (its selling point is
        # in-kernel fp32 dbias)
        dqkv, dls, dbias = _pallas_backward_v4(
            qkv, logit_scale, bias_packed, mask, g, num_heads, interpret)
    elif grid_mode == "split":
        # two passes: dq/dk/dv/dls on the window-resident grid WITHOUT the
        # ds dump; dbias in a dedicated pass that accumulates in-kernel
        # (fp32, consecutive-revisit) with the bias block resident.
        dqkv, dls, _ = _pallas_backward(
            qkv, logit_scale, bias_packed, mask, g, num_heads, interpret,
            mxu, dump_ds=False, rden=rden, wpc=wpc)
        dbias = _pallas_dbias(qkv, logit_scale, bias_packed, mask, g,
                              num_heads, interpret, mxu)
    else:
        dqkv, dls, dbias = _pallas_backward(
            qkv, logit_scale, bias_packed, mask, g, num_heads, interpret,
            mxu, rden=rden, wpc=wpc)
    return dqkv, dls, dbias, None


_packed_op.defvjp(_packed_fwd, _packed_bwd)


def cosine_window_attention_packed(qkv: jnp.ndarray,
                                   logit_scale: jnp.ndarray,
                                   bias_packed: jnp.ndarray,
                                   mask: Optional[jnp.ndarray] = None,
                                   *, num_heads: int,
                                   interpret: Optional[bool] = None,
                                   grid_mode: Optional[str] = None,
                                   mxu: Optional[str] = None,
                                   windows_per_cell=None):
    """Fused packed-layout cosine window attention.

    qkv: (B_, N, 3C) as produced by the qkv Dense (+q/v bias); bias_packed:
    (nG, Np, HG*Np) from `pack_rpe_bias`; returns (B_, N, C). Falls back to
    interpret mode off-TPU so tests exercise the kernel logic on CPU.

    grid_mode: "window_resident" (v2 grid), "split" (v2 grid + dedicated
    in-kernel-accumulated dbias pass — no ds dump), or "bias_resident"
    (v4 single-pass grid). Defaults to DEFAULT_GRID_MODE
    (MMDE_ATTN_GRID env).

    mxu: "fp32" | "fold" | "bf16" (see _fwd_body). Defaults to
    MXU_BF16_DEFAULT for bf16 inputs (MMDE_ATTN_MXU env, read at import),
    "fp32" for fp32 inputs — fp32 models always keep the exact pipeline.

    windows_per_cell: "auto" | int | None — W windows share one grid cell
    (round-5 experiment, measured slower at flagship shapes; default W=1).
    None = the module default (MMDE_ATTN_W env, read at import).
    """
    if interpret is None:
        interpret = not _on_tpu()
    if grid_mode is None:
        grid_mode = DEFAULT_GRID_MODE
    elif grid_mode not in GRID_MODES:
        raise ValueError(f"grid_mode={grid_mode!r} not in {GRID_MODES}")
    if mxu is None:
        mxu = MXU_BF16_DEFAULT if qkv.dtype == jnp.bfloat16 else "fp32"
    return _packed_op(qkv, logit_scale, bias_packed, mask, num_heads,
                      interpret, grid_mode, mxu, windows_per_cell)

"""Fused Pallas TPU kernel for SwinV2 cosine window attention.

One grid cell per (window, head, q-row-block): the attention tile lives in
VMEM only, so the qk product, temperature scaling, RPE bias add, shift mask
add, softmax and the @v contraction all fuse into a single kernel with no
HBM round-trip for the attention matrix. XLA, by contrast, materializes the
(B*nW, nH, N, N) logits tensor in HBM between the two matmuls — at
swin-base 480x480 that is ~50 MB of traffic each way per layer.

For large windows (N = 900 at window 30) the q dimension is tiled so the
per-cell footprint (q tile + full k/v + (BQ, N) logits + bias/mask tiles)
stays within the 16 MB VMEM budget. Tiling over q rows is exact — every
cell sees all keys, so no online-softmax rescaling is needed.

Dispatch: `window_attention(..., impl=)` — "pallas" uses this kernel on TPU
(interpret mode elsewhere, so tests validate the kernel logic on CPU);
"xla" uses the reference implementation in mmde_tpu.ops.window_attention.

Gradients: custom_vjp with a fused Pallas backward — one grid cell per
(window, head, q-block) recomputes the attention tile in VMEM and produces
dq directly plus dk/dv (accumulated over q-blocks), dbias (accumulated over
windows) and d(logit_scale) without materializing any N x N tensor in HBM.
Set MMDE_PALLAS_XLA_BWD=1 to fall back to the XLA-rematerialized backward.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmde_tpu.ops.window_attention import (
    MAX_LOGIT_SCALE, cosine_window_attention as _xla_cosine)

# Windows with up to this many tokens run as a single whole-window block;
# larger ones are padded and tiled over q rows with the minimal number of
# tiles (the TPU lowering requires q-tile row counts divisible by 8, and
# e.g. 900 has no such divisor, so N is padded to a multiple of 8*nQ —
# window 30 -> N=900 -> Np=912, BQ=456, only 1.3% padding).
_MAX_SINGLE = 512
# The backward kernel keeps ~5 (BQ, Np) intermediates + the dbias output
# tile live, so its q tiles must be smaller to fit 16 MB VMEM.
_MAX_SINGLE_BWD = 256
_NEG_INF = -1e9


def _tile_plan(n: int, max_single: int = _MAX_SINGLE):
    """(BQ, Np, nQ) for a window of n tokens: minimal number of 8-divisible
    q tiles covering n with the least padding."""
    if n <= max_single:
        return n, n, 1
    nq = -(-n // max_single)
    step = 8 * nq
    np_ = -(-n // step) * step
    return np_ // nq, np_, nq


def _kernel(ls_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref):
    """One (window, head, q-block) cell. Refs:
    ls (nH, 1) whole-array SMEM; q (1, 1, BQ, Dh); k/v (1, 1, N, Dh);
    bias (1, BQ, N); mask (1, BQ, N) or None; out (1, 1, BQ, Dh)."""
    q = q_ref[0, 0].astype(jnp.float32)                 # (BQ, Dh)
    k = k_ref[0, 0].astype(jnp.float32)                 # (N, Dh)
    v = v_ref[0, 0]

    qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)

    h = pl.program_id(1)
    scale = jnp.exp(jnp.minimum(ls_ref[h, 0], MAX_LOGIT_SCALE))
    s = jax.lax.dot_general(qn, kn, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale
    s = s + bias_ref[0].astype(jnp.float32)
    if mask_ref is not None:
        s = s + mask_ref[0].astype(jnp.float32)

    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    out = jax.lax.dot_general(p, v.astype(jnp.float32),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _mask_free_kernel(ls_ref, q_ref, k_ref, v_ref, bias_ref, out_ref):
    _kernel(ls_ref, q_ref, k_ref, v_ref, bias_ref, None, out_ref)


def _pallas_forward(q, k, v, logit_scale, bias, mask, interpret: bool):
    B, nH, N, Dh = q.shape
    ls2 = logit_scale.reshape(nH, 1).astype(jnp.float32)

    BQ, Np, nQ = _tile_plan(N)
    if Np != N:
        pad = Np - N
        qkv_pad = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, qkv_pad)
        k = jnp.pad(k, qkv_pad)
        v = jnp.pad(v, qkv_pad)
        # padded KEY columns must never win the softmax: pad bias with -1e9
        # (padded q rows produce garbage that is sliced off below)
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)),
                       constant_values=_NEG_INF)
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, pad), (0, pad)))

    ls_spec = pl.BlockSpec(memory_space=pltpu.SMEM)    # whole (nH, 1) array
    q_spec = pl.BlockSpec((1, 1, BQ, Dh), lambda b, h, iq: (b, h, iq, 0))
    kv_spec = pl.BlockSpec((1, 1, Np, Dh), lambda b, h, iq: (b, h, 0, 0))
    bias_spec = pl.BlockSpec((1, BQ, Np), lambda b, h, iq: (h, iq, 0))

    in_specs = [ls_spec, q_spec, kv_spec, kv_spec, bias_spec]
    args = [ls2, q, k, v, bias]
    if mask is not None:
        nW = mask.shape[0]
        mask_spec = pl.BlockSpec((1, BQ, Np), lambda b, h, iq: (b % nW, iq, 0))
        in_specs.append(mask_spec)
        args.append(mask)
        kernel = _kernel
    else:
        kernel = _mask_free_kernel

    out_spec = pl.BlockSpec((1, 1, BQ, Dh), lambda b, h, iq: (b, h, iq, 0))

    out = pl.pallas_call(
        kernel,
        grid=(B, nH, nQ),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, nH, Np, Dh), v.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"))
        if not interpret else None,
    )(*args)
    return out[:, :, :N] if Np != N else out


def _bwd_kernel(ls_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, dls_ref):
    """Fused backward for one (window, head, q-block) cell.

    Recomputes qn/kn/S/P for the tile, then:
      dP = g @ v^T;  dS = P (dP - rowsum(dP*P))
      dv += P^T g          (accumulated over q-blocks)
      dbias += dS          (accumulated over windows)
      dls  += a * sum(dS * C) * 1[ls < max]   (accumulated over all cells)
      dq   = r_q (a dS kn - qn rowsum(.))     (normalize vjp, written once)
      dk   via accumulated dkn = a dS^T qn, normalize vjp applied on the
            last q-block when the sum is complete.
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    iq = pl.program_id(2)
    n_iq = pl.num_programs(2)
    first_b = b == 0
    first_iq = iq == 0
    last_iq = iq == n_iq - 1
    first_cell = jnp.logical_and(first_b, jnp.logical_and(h == 0, first_iq))

    q = q_ref[0, 0].astype(jnp.float32)                 # (BQ, Dh)
    k = k_ref[0, 0].astype(jnp.float32)                 # (Np, Dh)
    v = v_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)                 # (BQ, Dh)

    rq = jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    rk = jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
    qn = q * rq
    kn = k * rk

    ls = ls_ref[h, 0]
    scale = jnp.exp(jnp.minimum(ls, MAX_LOGIT_SCALE))
    c = jax.lax.dot_general(qn, kn, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (BQ, Np)
    s = c * scale + bias_ref[0].astype(jnp.float32)
    if mask_ref is not None:
        s = s + mask_ref[0].astype(jnp.float32)
    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (BQ, Np)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    # dv accumulation over q-blocks
    dv_part = jax.lax.dot_general(p, g, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(first_iq)
    def _():
        dv_ref[0, 0] = dv_part

    @pl.when(jnp.logical_not(first_iq))
    def _():
        dv_ref[0, 0] += dv_part

    # per-window ds dump (write-once block): compiled Mosaic does not
    # support accumulating into an output block across NON-consecutive grid
    # steps (the old dbias += across windows silently corrupted gradients on
    # real TPU — tools/check_attention_grads_tpu.py); the caller reduces
    # dbias = sum_b ds in XLA instead.
    dbias_ref[0, 0] = ds.astype(dbias_ref.dtype)

    # d(logit_scale): a * sum(dS * C), gated by the clamp. TPU VMEM stores
    # must be vectors: accumulate the scalar into lane 0 of the head's row.
    gate = (ls < MAX_LOGIT_SCALE).astype(jnp.float32)
    dls_val = scale * jnp.sum(ds * c) * gate
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    contrib = jnp.where(lane == 0, dls_val, 0.0)

    @pl.when(first_cell)
    def _():
        dls_ref[:, :] = jnp.zeros(dls_ref.shape, jnp.float32)

    dls_ref[pl.ds(h, 1), :] += contrib

    # dq (written once per cell)
    dqn = scale * jax.lax.dot_general(ds, kn, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dq = rq * (dqn - qn * jnp.sum(dqn * qn, axis=-1, keepdims=True))
    dq_ref[0, 0] = dq

    # dk via accumulated dkn, normalize-vjp on the last q-block
    dkn_part = scale * jax.lax.dot_general(ds, qn, (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)

    @pl.when(first_iq)
    def _():
        dk_ref[0, 0] = dkn_part

    @pl.when(jnp.logical_not(first_iq))
    def _():
        dk_ref[0, 0] += dkn_part

    @pl.when(last_iq)
    def _():
        dkn = dk_ref[0, 0]
        dk_ref[0, 0] = rk * (dkn - kn * jnp.sum(dkn * kn, axis=-1,
                                                keepdims=True))


def _mask_free_bwd_kernel(ls_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                          dq_ref, dk_ref, dv_ref, dbias_ref, dls_ref):
    _bwd_kernel(ls_ref, q_ref, k_ref, v_ref, bias_ref, None, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, dls_ref)


def _pallas_backward(q, k, v, logit_scale, bias, mask, g, interpret: bool):
    B, nH, N, Dh = q.shape
    in_dtype = q.dtype
    ls2 = logit_scale.reshape(nH, 1).astype(jnp.float32)

    BQ, Np, nQ = _tile_plan(N, _MAX_SINGLE_BWD)
    if Np != N:
        pad = Np - N
        qkv_pad = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, qkv_pad)
        k = jnp.pad(k, qkv_pad)
        v = jnp.pad(v, qkv_pad)
        g = jnp.pad(g, qkv_pad)
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)),
                       constant_values=_NEG_INF)
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, pad), (0, pad)))

    ls_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    q_spec = pl.BlockSpec((1, 1, BQ, Dh), lambda b, h, iq: (b, h, iq, 0))
    kv_spec = pl.BlockSpec((1, 1, Np, Dh), lambda b, h, iq: (b, h, 0, 0))
    bias_spec = pl.BlockSpec((1, BQ, Np), lambda b, h, iq: (h, iq, 0))

    in_specs = [ls_spec, q_spec, kv_spec, kv_spec, bias_spec]
    args = [ls2, q, k, v, bias]
    if mask is not None:
        nW = mask.shape[0]
        in_specs.append(pl.BlockSpec((1, BQ, Np),
                                     lambda b, h, iq: (b % nW, iq, 0)))
        args.append(mask)
        kernel = _bwd_kernel
    else:
        kernel = _mask_free_bwd_kernel
    in_specs.append(q_spec)          # g
    args.append(g)

    out_shapes = (
        jax.ShapeDtypeStruct((B, nH, Np, Dh), jnp.float32),   # dq
        jax.ShapeDtypeStruct((B, nH, Np, Dh), jnp.float32),   # dk
        jax.ShapeDtypeStruct((B, nH, Np, Dh), jnp.float32),   # dv
        # per-window ds tiles (write-once); summed to dbias in XLA below,
        # in the INPUT dtype (fp32 in -> exact fp32 RPE grads; bf16 in ->
        # halved ds_all HBM traffic, ~0.4% relative partial rounding)
        jax.ShapeDtypeStruct((B, nH, Np, Np), in_dtype),
        jax.ShapeDtypeStruct((nH, 128), jnp.float32),         # dls (col 0)
    )
    out_specs = (
        pl.BlockSpec((1, 1, BQ, Dh), lambda b, h, iq: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, Np, Dh), lambda b, h, iq: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Np, Dh), lambda b, h, iq: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, BQ, Np), lambda b, h, iq: (b, h, iq, 0)),
        pl.BlockSpec((nH, 128), lambda b, h, iq: (0, 0)),
    )

    dq, dk, dv, ds_all, dls = pl.pallas_call(
        kernel,
        grid=(B, nH, nQ),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"))
        if not interpret else None,
    )(*args)

    dq = dq[:, :, :N].astype(in_dtype)
    dk = dk[:, :, :N].astype(in_dtype)
    dv = dv[:, :, :N].astype(in_dtype)
    dbias = jnp.sum(ds_all.astype(jnp.float32), axis=0)[:, :N, :N]
    dls = dls[:, 0].reshape(logit_scale.shape).astype(logit_scale.dtype)
    return dq, dk, dv, dls, dbias


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:                                 # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _pallas_op(q, k, v, logit_scale, bias, mask, interpret):
    return _pallas_forward(q, k, v, logit_scale, bias, mask, interpret)


def _pallas_fwd(q, k, v, logit_scale, bias, mask, interpret):
    out = _pallas_forward(q, k, v, logit_scale, bias, mask, interpret)
    return out, (q, k, v, logit_scale, bias, mask)


def _pallas_bwd(interpret, res, g):
    q, k, v, logit_scale, bias, mask = res
    if os.environ.get("MMDE_PALLAS_XLA_BWD") == "1":
        # Fallback: exact gradients via the XLA path (rematerialized).
        def f(q, k, v, ls, bias):
            return _xla_cosine(q, k, v, ls, bias, mask)
        _, vjp = jax.vjp(f, q, k, v, logit_scale, bias)
        dq, dk, dv, dls, dbias = vjp(g)
        return dq, dk, dv, dls, dbias, None
    dq, dk, dv, dls, dbias = _pallas_backward(q, k, v, logit_scale, bias,
                                              mask, g, interpret)
    return dq, dk, dv, dls, dbias, None


_pallas_op.defvjp(_pallas_fwd, _pallas_bwd)


def cosine_window_attention_pallas(q, k, v, logit_scale, bias,
                                   mask: Optional[jnp.ndarray] = None,
                                   interpret: Optional[bool] = None):
    """Fused cosine window attention. Falls back to interpret mode off-TPU
    so the same code path is testable on CPU."""
    if interpret is None:
        interpret = not _on_tpu()
    return _pallas_op(q, k, v, logit_scale, bias, mask, interpret)


def window_attention(q, k, v, logit_scale, bias, mask=None, impl: str = "xla"):
    """Dispatch between the fused Pallas kernel and the XLA reference."""
    if impl == "pallas":
        return cosine_window_attention_pallas(q, k, v, logit_scale, bias, mask)
    return _xla_cosine(q, k, v, logit_scale, bias, mask)

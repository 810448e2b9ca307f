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

Gradients: custom_vjp whose backward re-derives the attention in plain XLA
(rematerialized, exact) — the forward kernel is used in eval/serving and the
fwd pass of training. A fused Pallas backward is a follow-up optimization.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmde_tpu.ops.window_attention import (
    MAX_LOGIT_SCALE, cosine_window_attention as _xla_cosine)

# Windows with up to this many tokens run as a single whole-window block;
# larger ones are padded to a multiple of _BQ and tiled over q rows (the TPU
# lowering requires q-tile row counts divisible by 8, and e.g. 900 has no
# such divisor, so padding + tiling is the general scheme).
_MAX_SINGLE = 512
_BQ = 256
_NEG_INF = -1e9


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

    if N <= _MAX_SINGLE:
        BQ, Np = N, N
    else:
        BQ = _BQ
        Np = -(-N // _BQ) * _BQ
    nQ = Np // BQ

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
    # Exact gradients via the XLA reference path (rematerialized forward).
    def f(q, k, v, ls, bias):
        return _xla_cosine(q, k, v, ls, bias, mask)
    _, vjp = jax.vjp(f, q, k, v, logit_scale, bias)
    dq, dk, dv, dls, dbias = vjp(g)
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

"""Fused Pallas TPU kernel for SwinV2 cosine window attention.

One grid cell per (window, head): the full N x N attention matrix lives in
VMEM only (N = window_size^2 <= 900 for the reference configs -> ~3.2 MB
fp32), so the qk product, temperature scaling, RPE bias add, shift mask add,
softmax and the @v contraction all fuse into a single kernel with no HBM
round-trip for the attention matrix. XLA, by contrast, materializes the
(B*nW, nH, N, N) logits tensor in HBM between the two matmuls — at
swin-base 480x480 that is ~50 MB per window-batch of traffic each way.

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


def _kernel(ls_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref):
    """Body for one (window, head) cell. Refs:
    ls (1, 1) SMEM; q/k/v (1, 1, N, Dh); bias (1, N, N); mask (1, N, N) or
    None; out (1, 1, N, Dh)."""
    q = q_ref[0, 0].astype(jnp.float32)                 # (N, Dh)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]

    qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)

    scale = jnp.exp(jnp.minimum(ls_ref[0, 0], MAX_LOGIT_SCALE))
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


def _pallas_forward(q, k, v, logit_scale, bias, mask, interpret: bool):
    B, nH, N, Dh = q.shape
    ls2 = logit_scale.reshape(nH, 1).astype(jnp.float32)

    qkv_spec = pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0))
    bias_spec = pl.BlockSpec((1, N, N), lambda b, h: (h, 0, 0))
    ls_spec = pl.BlockSpec((1, 1), lambda b, h: (h, 0),
                           memory_space=pltpu.SMEM)

    in_specs = [ls_spec, qkv_spec, qkv_spec, qkv_spec, bias_spec]
    args = [ls2, q, k, v, bias]
    if mask is not None:
        nW = mask.shape[0]
        mask_spec = pl.BlockSpec((1, N, N), lambda b, h: (b % nW, 0, 0))
        in_specs.append(mask_spec)
        args.append(mask)
        kernel = _kernel
    else:
        kernel = _mask_free_kernel

    out_spec = pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0))

    return pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, nH, N, Dh), v.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")) if not interpret
        else None,
    )(*args)


def _mask_free_kernel(ls_ref, q_ref, k_ref, v_ref, bias_ref, out_ref):
    _kernel(ls_ref, q_ref, k_ref, v_ref, bias_ref, None, out_ref)


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

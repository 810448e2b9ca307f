"""Windowed multi-head attention — functional XLA reference implementation.

This is the hot op of the SwinV2 encoder (reference
models/swin_transformer_v2.py:275-336): per-window cosine-similarity
attention with a learned temperature (logit_scale) and a continuous
relative-position bias, plus the additive shifted-window mask.

The Pallas fused kernel (mmde_tpu/ops/window_attention_pallas.py) implements
the same signature; `mmde_tpu.nn.swin_v2` dispatches between them. Keeping
the XLA path authoritative gives a bit-comparable fallback for tests and for
non-TPU backends.

Shapes:
    q, k, v:    (B, nH, N, Dh)   B = batch*num_windows, N = window tokens
    logit_scale:(nH, 1, 1)       log-temperature (cosine path only)
    bias:       (nH, N, N)       relative position bias (already activated)
    mask:       (nW, N, N) or None   additive 0/-100 shifted-window mask;
                                 B must be a multiple of nW.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Max value of the learned temperature: exp(logit_scale) <= 100
# (reference clamps logit_scale to log(1/0.01), swin_transformer_v2.py:294).
MAX_LOGIT_SCALE = 4.605170185988091  # ln(100)


def _apply_mask_and_softmax(attn: jnp.ndarray, mask: Optional[jnp.ndarray],
                            out_dtype) -> jnp.ndarray:
    if mask is not None:
        nW = mask.shape[0]
        B = attn.shape[0]
        nH, N = attn.shape[1], attn.shape[2]
        attn = attn.reshape(B // nW, nW, nH, N, N)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(B, nH, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    return attn.astype(out_dtype)


def cosine_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            logit_scale: jnp.ndarray,
                            bias: jnp.ndarray,
                            mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SwinV2 cosine attention: softmax(q̂·k̂ᵀ·e^s + bias [+ mask]) · v.

    q/k are L2-normalized along Dh in float32; the logits and softmax run in
    float32 regardless of the input dtype (mirrors the fp32-forced spots in
    the reference, swin_transformer_v2.py:291-298); the output is cast back
    to v.dtype.
    """
    out_dtype = v.dtype
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn = qf * jax.lax.rsqrt(jnp.sum(qf * qf, axis=-1, keepdims=True) + 1e-12)
    kn = kf * jax.lax.rsqrt(jnp.sum(kf * kf, axis=-1, keepdims=True) + 1e-12)
    scale = jnp.exp(jnp.clip(logit_scale, max=MAX_LOGIT_SCALE)).astype(jnp.float32)
    attn = jnp.einsum("bhnd,bhmd->bhnm", qn, kn,
                      preferred_element_type=jnp.float32)
    attn = attn * scale[None]
    attn = attn + bias[None].astype(jnp.float32)
    attn = _apply_mask_and_softmax(attn, mask, out_dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                      preferred_element_type=jnp.float32).astype(out_dtype)


def scaled_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            scale: float,
                            bias: jnp.ndarray,
                            mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SwinV1-style dot-product attention (attn_type='normal',
    swin_transformer_v2.py:296-298): softmax(q·kᵀ·scale + bias [+ mask])·v,
    logits in float32."""
    out_dtype = v.dtype
    attn = jnp.einsum("bhnd,bhmd->bhnm", (q * scale).astype(jnp.float32),
                      k.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(jnp.float32)
    attn = _apply_mask_and_softmax(attn, mask, out_dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                      preferred_element_type=jnp.float32).astype(out_dtype)

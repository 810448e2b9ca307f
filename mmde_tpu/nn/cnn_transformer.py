"""Hybrid CNN + transformer encoder and the ResNet-only encoder (NHWC).

Capability parity with reference models/cnn_transformer.py and
models/resnet_only.py:
  * ResNet-50/18 trunk (multi-scale f3/f4/f5 or single stride-16 feature);
  * per-scale squeeze convs + 3-scale fusion to hidden_dim at stride 16
    (ref cnn_transformer.py:87-128): f3 downsampled x0.5, f5 upsampled x2;
  * sine positional embedding, temperature 20, normalized (ref :153-189) —
    computed host-side at trace time (static H/W) instead of on-device
    cumsums;
  * 6 post-norm transformer encoder layers with q=k=feat+pos, v=feat and the
    residual added to v (ref :192-231);
  * resnet_only variant: same feature extractors, no transformer
    (ref resnet_only.py:152-168).
"""
from __future__ import annotations

import math
from typing import Any

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from mmde_tpu.nn.layers import ConvBnRelu, TorchBatchNorm
from mmde_tpu.nn.resnet import ResNetMultiScale, ResNetSingleScale

Dtype = Any


def sine_position_embedding(h: int, w: int, num_pos_feats: int,
                            temperature: float = 20.0,
                            normalize: bool = True) -> np.ndarray:
    """(1, h, w, 2*num_pos_feats) sine/cosine position grid, matching the
    DETR-style embedding at ref cnn_transformer.py:153-189 (for an all-valid
    mask the cumsums are just 1..h / 1..w)."""
    y = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.ones((h, 1), np.float32) * np.arange(1, w + 1, dtype=np.float32)[None, :]
    if normalize:
        eps = 1e-6
        scale = 2 * math.pi
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1)[None].astype(np.float32)


class FeatureExtractorMultiScale(nn.Module):
    """3-scale squeeze + fuse to hidden_dim at stride 16 (ref :87-128)."""
    hidden_dim: int
    cnn_model: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f3, f4, f5 = ResNetMultiScale(model=self.cnn_model, dtype=self.dtype,
                                      name="backbone")(x, train)

        def squeeze(f, name):
            f = ConvBnRelu(self.hidden_dim, 3, dtype=self.dtype,
                           name=f"{name}_a")(f, train)
            return ConvBnRelu(self.hidden_dim, 3, dtype=self.dtype,
                              name=f"{name}_b")(f, train)

        f3 = squeeze(f3, "squeeze1")
        f4 = squeeze(f4, "squeeze2")
        f5 = squeeze(f5, "squeeze3")

        # F.interpolate with no mode arg is nearest (ref :123-124). torch
        # nearest maps output i -> input floor(i * in/out): for x0.5 that is
        # every even pixel, for x2 a 2x2 pixel repeat. jax.image.resize
        # "nearest" centers the grid (samples odd pixels on x0.5), so use
        # exact stride-slice / repeat instead, then align both to f4's grid.
        # At /32-divisible inputs the align is a no-op (XLA drops the
        # identity slice) and the result is bit-equal to the reference; at
        # other sizes the reference's torch.cat CRASHES on the off-by-one
        # (e.g. H=240: f4 15 rows vs f5 upsampled 16) — cropping to f4 is
        # torch-nearest-exact there too (floor(i*in/out) of an up-by-2
        # resize to an odd target is repeat-2 truncated).
        f3 = f3[:, ::2, ::2, :]
        f5 = jnp.repeat(jnp.repeat(f5, 2, axis=1), 2, axis=2)
        Hf, Wf = f4.shape[1], f4.shape[2]
        f3 = f3[:, :Hf, :Wf, :]
        f5 = f5[:, :Hf, :Wf, :]

        fused = jnp.concatenate([f3, f4, f5], axis=-1)
        fused = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                        name="combine_a")(fused)
        fused = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype,
                               name="BatchNorm_0")(fused)
        fused = nn.relu(fused)
        return nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                       name="combine_b")(fused)


class FeatureExtractorSingleScale(nn.Module):
    """Single stride-16 squeeze (ref :130-151)."""
    hidden_dim: int
    cnn_model: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = ResNetSingleScale(model=self.cnn_model, dtype=self.dtype,
                              name="backbone")(x, train)
        f = ConvBnRelu(self.hidden_dim, 3, dtype=self.dtype,
                       name="squeeze_a")(f, train)
        return ConvBnRelu(self.hidden_dim, 3, dtype=self.dtype,
                          name="squeeze_b")(f, train)


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer: q=k=x+pos, v=x, residual on v (ref :192-231)."""
    hidden_dim: int
    ff_dim: int = 4096
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, train: bool = False):
        num_heads = 4 if self.hidden_dim == 256 else 8
        q = k = x + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=num_heads, dtype=self.dtype, name="self_attn",
        )(inputs_q=q, inputs_k=k, inputs_v=x)
        x = x + nn.Dropout(self.dropout)(attn, deterministic=not train)
        # torch nn.LayerNorm default eps (ref :208,215)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)

        y = nn.Dense(self.ff_dim, dtype=self.dtype, name="ffn1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=not train)
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="ffn2")(y)
        x = x + nn.Dropout(self.dropout)(y, deterministic=not train)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)


class CnnTransformer(nn.Module):
    """ResNet features + sine pos + n_enc_layers transformer (ref :234-263).
    Returns [feat] (NHWC) like the encoder registry expects."""
    hidden_dim: int = 512
    n_enc_layers: int = 6
    multi_scale: bool = True
    cnn_model: str = "resnet50"
    ff_dim: int = 4096
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.multi_scale:
            feat = FeatureExtractorMultiScale(
                self.hidden_dim, self.cnn_model, dtype=self.dtype,
                name="feature_extractor")(x, train)
        else:
            feat = FeatureExtractorSingleScale(
                self.hidden_dim, self.cnn_model, dtype=self.dtype,
                name="feature_extractor")(x, train)

        B, H, W, C = feat.shape
        pos = jnp.asarray(sine_position_embedding(H, W, C // 2)).astype(feat.dtype)

        tokens = feat.reshape(B, H * W, C)
        pos_tokens = jnp.broadcast_to(pos.reshape(1, H * W, C),
                                      (B, H * W, C))
        for i in range(self.n_enc_layers):
            tokens = TransformerEncoderLayer(
                hidden_dim=self.hidden_dim, ff_dim=self.ff_dim,
                dtype=self.dtype, name=f"enc_{i}",
            )(tokens, pos_tokens, train)

        return [tokens.reshape(B, H, W, C)]


class ResNetOnly(nn.Module):
    """Feature extractor without the transformer (ref resnet_only.py)."""
    hidden_dim: int = 512
    multi_scale: bool = True
    cnn_model: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.multi_scale:
            feat = FeatureExtractorMultiScale(
                self.hidden_dim, self.cnn_model, dtype=self.dtype,
                name="feature_extractor")(x, train)
        else:
            feat = FeatureExtractorSingleScale(
                self.hidden_dim, self.cnn_model, dtype=self.dtype,
                name="feature_extractor")(x, train)
        return [feat]

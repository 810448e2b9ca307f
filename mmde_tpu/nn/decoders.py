"""Twin-headed decoders: dense depth + relative pose regression (NHWC).

Capability parity with reference models/decoder_v1.py / decoder_v2.py:
  * Decoder_Pose (ref decoder_v2.py:22-77): conv + two stride-2 conv blocks
    -> global average pool -> two MLP regressors (9-dim rotation, 3-dim
    translation) with dropout 0.5; rotation projected to the orthogonal
    polar factor via batched SVD (mmde_tpu.geometry.normalize_rotation).
  * Decoder_Depth (ref decoder_v2.py:79-158): N ConvTranspose(k2,s2)+BN+ReLU
    blocks -> conv+BN+ReLU -> bilinear x2 upsampling loop -> 2-conv head ->
    sigmoid * max_depth.
  * Decoder_v1 (ref decoder_v1.py:170-187): one pass over concat(f1,f2),
    2-channel depth head chunked into (d1, d2); pose only forward direction.
  * Decoder_v2 (ref decoder_v2.py:170-191): two passes with swapped concat
    giving (d1,r12,t12) and (d2,r21,t21).

All convs use the reference's init (normal std=0.001); BatchNorm runs in
fp32 with batch statistics (use_running_average at eval).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from mmde_tpu.geometry import normalize_rotation
from mmde_tpu.nn.layers import TorchBatchNorm, torch_deconv

Dtype = Any

_conv_init = nn.initializers.normal(stddev=0.001)


def _bn(name: str, dtype: Dtype = jnp.float32) -> TorchBatchNorm:
    """BatchNorm factory (reference decoder init: scale=1, bias=0);
    torch-exact running-stat semantics (see TorchBatchNorm). Statistics and
    normalization run in fp32 regardless of `dtype`; the OUTPUT is cast to
    the activation dtype — fp32 outputs in a bf16 model forced every
    downstream resize/relu/conv-input chain to fp32 (measured ~2x bytes on
    the full-res decoder tail, docs/PERF.md round 4)."""
    return TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype,
                          name=name)


class Regression(nn.Module):
    """3-layer MLP head with dropout 0.5 (ref decoder_v2.py:8-20)."""
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Dense(c // 2, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        x = nn.Dense(c // 4, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc3")(x)


class DecoderPose(nn.Module):
    """Pose head (ref decoder_v2.py:22-77)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c = feats.shape[-1]

        def conv(x, stride, name):
            # torch-style pad (1,1): flax SAME pads (0,1) at stride 2 on
            # even extents, shifting the grid off the reference's Conv2d
            return nn.Conv(c, (3, 3), strides=(stride, stride),
                           padding=((1, 1), (1, 1)),
                           kernel_init=_conv_init, dtype=self.dtype,
                           name=name)(x)

        ura = not train
        x = nn.relu(_bn("bn0", self.dtype)(conv(feats, 1, "conv0"), use_running_average=ura))
        x = nn.relu(_bn("bn1a", self.dtype)(conv(x, 2, "down1_a"), use_running_average=ura))
        x = nn.relu(_bn("bn1b", self.dtype)(conv(x, 1, "down1_b"), use_running_average=ura))
        x = nn.relu(_bn("bn2a", self.dtype)(conv(x, 2, "down2_a"), use_running_average=ura))
        x = nn.relu(_bn("bn2b", self.dtype)(conv(x, 1, "down2_b"), use_running_average=ura))

        x = jnp.mean(x, axis=(1, 2))                       # global avg pool
        rot = Regression(9, dtype=self.dtype, name="rot_head")(x, train)
        trans = Regression(3, dtype=self.dtype, name="trans_head")(x, train)
        rot = normalize_rotation(rot.astype(jnp.float32)).astype(rot.dtype)
        return rot, trans


class DecoderDepth(nn.Module):
    """Depth head (ref decoder_v2.py:79-158).

    head_channels: 1 (decoder_v2 per-pass) or 2 (decoder_v1 fused d1+d2).
    """
    out_channels: int
    max_depth: float
    num_deconv: int = 3
    num_filters: Sequence[int] = (32, 32, 32)
    deconv_kernels: Sequence[int] = (2, 2, 2)
    num_upscale: int = 2
    head_channels: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats
        for i in range(self.num_deconv):
            x = torch_deconv(x, self.num_filters[i], self.deconv_kernels[i],
                             dtype=self.dtype, name=f"deconv_{i}",
                             kernel_init=_conv_init)
            x = nn.relu(_bn(f"deconv_bn_{i}", self.dtype)(x, use_running_average=not train))

        x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    kernel_init=_conv_init, dtype=self.dtype, name="conv")(x)
        x = nn.relu(_bn("conv_bn", self.dtype)(x, use_running_average=not train))

        for _ in range(self.num_upscale):
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")

        x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    kernel_init=_conv_init, dtype=self.dtype, name="head_a")(x)
        x = nn.relu(x)
        # NOTE (round 4): zero-padding the head_b kernel to 8 output lanes
        # (the "degenerate 1-channel conv" theory) was built, verified
        # exact, and A/B-measured SLOWER e2e (10.16 -> 10.11 twice) — the
        # plain conv stays.
        x = nn.Conv(self.head_channels, (3, 3), padding="SAME",
                    kernel_init=_conv_init, dtype=self.dtype, name="head_b")(x)
        return jax.nn.sigmoid(x.astype(jnp.float32)) * self.max_depth


class DecoderV1(nn.Module):
    """Single pass, fused 2-channel depth + one pose direction
    (ref decoder_v1.py:170-187). Returns the 6-tuple
    (d1, r12, t12, d2, None, None)."""
    max_depth: float
    num_deconv: int = 3
    num_filters: Sequence[int] = (32, 32, 32)
    deconv_kernels: Sequence[int] = (2, 2, 2)
    num_upscale: int = 2
    out_channels: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat1, feat2, train: bool = False):
        feats = jnp.concatenate([feat1, feat2], axis=-1)
        rot, trans = DecoderPose(dtype=self.dtype, name="pose")(feats, train)
        depth = DecoderDepth(
            out_channels=self.out_channels, max_depth=self.max_depth,
            num_deconv=self.num_deconv, num_filters=self.num_filters,
            deconv_kernels=self.deconv_kernels, num_upscale=self.num_upscale,
            head_channels=2, dtype=self.dtype, name="depth")(feats, train)
        d1, d2 = depth[..., 0:1], depth[..., 1:2]
        return d1, rot, trans, d2, None, None


class DecoderV2(nn.Module):
    """Two passes with swapped feature order: bidirectional depth + pose
    (ref decoder_v2.py:170-191)."""
    max_depth: float
    num_deconv: int = 3
    num_filters: Sequence[int] = (32, 32, 32)
    deconv_kernels: Sequence[int] = (2, 2, 2)
    num_upscale: int = 2
    out_channels: int = 256                 # 2x embed (ref passes out*2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat1, feat2, train: bool = False):
        pose = DecoderPose(dtype=self.dtype, name="pose")
        depth = DecoderDepth(
            out_channels=self.out_channels, max_depth=self.max_depth,
            num_deconv=self.num_deconv, num_filters=self.num_filters,
            deconv_kernels=self.deconv_kernels, num_upscale=self.num_upscale,
            head_channels=1, dtype=self.dtype, name="depth")

        f12 = jnp.concatenate([feat1, feat2], axis=-1)
        r12, t12 = pose(f12, train)
        d1 = depth(f12, train)

        f21 = jnp.concatenate([feat2, feat1], axis=-1)
        r21, t21 = pose(f21, train)
        d2 = depth(f21, train)
        return d1, r12, t12, d2, r21, t21

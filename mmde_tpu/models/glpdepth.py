"""Legacy GLPDepth model family (NHWC, flax.linen).

Capability parity with the reference's backup models, which are still the
live models for test.py / backup/train_.py / train_void_with_* entry points:
  * GLPDepth (models/backup/model_.py:17-71): single-frame SwinV2 ->
    deconv decoder -> 1-channel sigmoid*max_depth head. Returns
    {"pred_d": (B, H, W, 1)}.
  * GLPDepthScale16 (models/backup/model_scale16.py:9-155): two-frame
    stride-16 variant (swin depths[:-1] or cnn_transformer) with a fused
    decoder producing both a 2-channel depth map and the 12-dim `out_p`
    pose vector (rot9 + trans3) — the "custom network" of
    train_void_with_custom_network.py / the sparse-depth downscale16 path.
    Returns {"pred_d1", "pred_d2", "out_p"}.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from mmde_tpu.config import ModelConfig
from mmde_tpu.models.two_frame import (SWIN_VARIANTS, _build_encoder,
                                        resolve_attn_impl)
from mmde_tpu.nn.swin_v2 import SwinTransformerV2
from mmde_tpu.nn.decoders import _bn, Regression, _conv_init
from mmde_tpu.nn.layers import torch_deconv

Dtype = Any


class _DeconvStack(nn.Module):
    """Deconv tower + conv head shared by the legacy decoders
    (model_.py:74-161)."""
    out_channels: int
    num_deconv: int = 3
    num_filters: Sequence[int] = (32, 32, 32)
    deconv_kernels: Sequence[int] = (2, 2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_deconv):
            x = torch_deconv(x, self.num_filters[i], self.deconv_kernels[i],
                             dtype=self.dtype, name=f"deconv_{i}",
                             kernel_init=_conv_init)
            x = nn.relu(_bn(f"deconv_bn_{i}", self.dtype)(x, use_running_average=not train))
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    kernel_init=_conv_init, dtype=self.dtype, name="conv")(x)
        return nn.relu(_bn("conv_bn", self.dtype)(x, use_running_average=not train))


class GLPDepth(nn.Module):
    """Single-frame depth model (model_.py): stride-32 swin feature, 3
    deconvs + 2 bilinear x2 upsamples back to full res."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, image, train: bool = False):
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        variant = next(v for v in SWIN_VARIANTS if v in self.cfg.backbone)
        embed_dim, num_heads = SWIN_VARIANTS[variant]
        s = self.cfg.swin
        encoder = SwinTransformerV2(
            embed_dim=embed_dim, depths=tuple(s.depths), num_heads=num_heads,
            window_size=tuple(s.window_size),
            pretrain_window_size=tuple(s.pretrain_window_size),
            use_shift=tuple(s.use_shift), out_indices=(len(s.depths) - 1,),
            drop_path_rate=s.drop_path_rate, use_checkpoint=s.use_checkpoint,
            attn_impl=resolve_attn_impl(self.cfg),
            dtype=dtype, name="encoder")
        feats = encoder(image.astype(dtype), deterministic=not train)

        x = _DeconvStack(out_channels=embed_dim, dtype=dtype,
                         name="decoder")(feats[-1], train)
        for _ in range(2):
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")
        x = nn.Conv(embed_dim, (3, 3), padding="SAME", kernel_init=_conv_init,
                    dtype=dtype, name="head_a")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (3, 3), padding="SAME", kernel_init=_conv_init,
                    dtype=dtype, name="head_b")(x)
        depth = jax.nn.sigmoid(x.astype(jnp.float32)) * self.cfg.max_depth
        return {"pred_d": depth}


class GLPDepthScale16(nn.Module):
    """Two-frame stride-16 variant with fused depth + 12-dim pose output
    (model_scale16.py). The `out_p` API is what
    train_void_with_custom_network.py:160 / test_void_with_*.py:85 expect."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, frame1, frame2, sparse1=None, sparse2=None,
                 train: bool = False):
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        b = self.cfg.backbone
        if "swin" in b:
            variant = next(v for v in SWIN_VARIANTS if v in b)
            embed_dim, num_heads = SWIN_VARIANTS[variant]
            s = self.cfg.swin
            depths = tuple(s.depths[:-1])
            encoder = SwinTransformerV2(
                embed_dim=embed_dim, depths=depths,
                num_heads=num_heads[:len(depths)],
                window_size=tuple(s.window_size[:len(depths)]),
                pretrain_window_size=tuple(s.pretrain_window_size[:len(depths)]),
                use_shift=tuple(s.use_shift[:len(depths)]),
                out_indices=(len(depths) - 1,),
                drop_path_rate=s.drop_path_rate,
                use_checkpoint=s.use_checkpoint,
                attn_impl=resolve_attn_impl(self.cfg),
                dtype=dtype, name="encoder")
        else:
            embed_dim = 128
            encoder = _build_encoder(self.cfg, dtype)

        if self.cfg.sparse_depth_input and sparse1 is not None:
            # depth-completion fusion: sparse depth (normalized by max_depth)
            # + validity mask as extra input channels for both frames
            def fuse(frame, sparse):
                sd = sparse / self.cfg.max_depth
                valid = (sparse > 0).astype(frame.dtype)
                return jnp.concatenate(
                    [frame, sd[..., None] if sd.ndim == frame.ndim - 1 else sd,
                     valid[..., None] if valid.ndim == frame.ndim - 1 else valid],
                    axis=-1)
            frame1 = fuse(frame1, sparse1)
            frame2 = fuse(frame2, sparse2 if sparse2 is not None else sparse1)

        # interleaved frame batching (see TwoFrameDepthPose): keeps each
        # device's pair local under data-parallel sharding
        B = frame1.shape[0]
        frames = jnp.stack([frame1, frame2], axis=1).astype(dtype)
        frames = frames.reshape((2 * B,) + frames.shape[2:])
        if isinstance(encoder, SwinTransformerV2):
            feats = encoder(frames, deterministic=not train)
        else:
            feats = encoder(frames, train=train)
        f = feats[-1]
        f = f.reshape((B, 2) + f.shape[1:])
        f1, f2 = f[:, 0], f[:, 1]
        feats_cat = jnp.concatenate([f1, f2], axis=-1)
        C = feats_cat.shape[-1]

        # pose branch (conv stack -> pooled -> 512-wide regressors,
        # model_scale16.py:83-95,139-150)
        def conv(x, stride, name):
            # torch-style pad (1,1): flax SAME pads (0,1) at stride 2 on
            # even extents, shifting the grid off the reference's Conv2d
            return nn.Conv(C, (3, 3), strides=(stride, stride),
                           padding=((1, 1), (1, 1)),
                           kernel_init=_conv_init, dtype=dtype, name=name)(x)

        p = nn.relu(_bn("bn_pos0", dtype)(conv(feats_cat, 1, "pos0"), use_running_average=not train))
        p = nn.relu(_bn("bn_pos1a", dtype)(conv(p, 2, "pos1a"), use_running_average=not train))
        p = nn.relu(_bn("bn_pos1b", dtype)(conv(p, 1, "pos1b"), use_running_average=not train))
        p = nn.relu(_bn("bn_pos2a", dtype)(conv(p, 2, "pos2a"), use_running_average=not train))
        p = nn.relu(_bn("bn_pos2b", dtype)(conv(p, 1, "pos2b"), use_running_average=not train))
        p = jnp.mean(p, axis=(1, 2))
        rot = _WideRegression(9, dtype=dtype, name="rot_head")(p, train)
        trans = _WideRegression(3, dtype=dtype, name="trans_head")(p, train)
        out_p = jnp.concatenate([rot, trans], axis=-1)

        # fused depth branch: 3 deconvs (/16 -> /2) + one x2 upsample
        d = _DeconvStack(out_channels=embed_dim * 2, dtype=dtype,
                         name="depth_stack")(feats_cat, train)
        B, H, W, Cd = d.shape
        d = jax.image.resize(d, (B, 2 * H, 2 * W, Cd), method="bilinear")
        d = nn.Conv(embed_dim * 2, (3, 3), padding="SAME",
                    kernel_init=_conv_init, dtype=dtype, name="head_a")(d)
        d = nn.relu(d)
        d = nn.Conv(2, (3, 3), padding="SAME", kernel_init=_conv_init,
                    dtype=dtype, name="head_b")(d)
        depth = jax.nn.sigmoid(d.astype(jnp.float32)) * self.cfg.max_depth
        return {"pred_d1": depth[..., 0:1], "pred_d2": depth[..., 1:2],
                "out_p": out_p}


class Scale16TwoFrame(nn.Module):
    """Adapter exposing GLPDepthScale16 through the standard two-frame
    prediction dict (out_p split into pred_r12/pred_t12; no reverse
    direction, like decoder_v1). Keeps the raw `out_p` for the legacy
    WeightedMSE(out_p, rel_pose12) training objective."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, frame1, frame2, train: bool = False,
                 sparse1=None, sparse2=None):
        out = GLPDepthScale16(cfg=self.cfg, name="net")(
            frame1, frame2, sparse1, sparse2, train)
        out_p = out["out_p"]
        return {"pred_d1": out["pred_d1"], "pred_d2": out["pred_d2"],
                "pred_r12": out_p[:, :9], "pred_t12": out_p[:, 9:12],
                "pred_r21": None, "pred_t21": None, "out_p": out_p}


class _WideRegression(nn.Module):
    """512-wide MLP head of the scale16 decoder (model_scale16.py:83-95)."""
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        x = nn.Dense(512, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc3")(x)

"""Two-frame depth + relative-pose model assembly (IDEDepth equivalent).

Capability parity with reference models/model.py:
  * encoder selected by backbone string: swin_{tiny,base,large,huge}_v2 with
    embed_dim 96/128/192/352 and matching head counts (ref :18-29);
    cnn_transformer[_multi_scale] / resnet_only[_multi_scale] with
    resnet50/resnet18 trunks (ref :72-103);
  * model_scale 32 (4 swin stages, stride-32 feature) vs 16 (3 stages,
    stride-16 feature, out_indices=(2,)) (ref :35-68);
  * decoder_v1 / decoder_v2 twin heads (ref :109-113);
  * forward: frames concatenated on the batch axis through the shared
    encoder, then chunked for the decoder (ref :115-126).

Unlike the reference (which mutates the args namespace from inside the model
constructor, ref :31-33), all derived hyperparameters live in the pure
`build_plan` function so configs stay immutable.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from mmde_tpu.config import ModelConfig
from mmde_tpu.nn.swin_v2 import SwinTransformerV2
from mmde_tpu.nn.cnn_transformer import CnnTransformer, ResNetOnly
from mmde_tpu.nn.decoders import DecoderV1, DecoderV2

Dtype = Any

# embed_dim / num_heads per swin variant (ref models/model.py:18-29).
# "nano" is an extension (not in the reference): a 32-wide variant for smoke
# tests and the driver dryrun — the decoder_v2 pose branch is O(C^2)-wide
# (5 convs at 2*C_last channels, ref decoder_v2.py:28-44), so even
# swin_tiny drags ~100M pose-conv params into tiny-shape dry runs.
SWIN_VARIANTS = {
    "nano": (32, (1, 2, 4, 8)),
    "tiny": (96, (3, 6, 12, 24)),
    "base": (128, (4, 8, 16, 32)),
    "large": (192, (6, 12, 24, 48)),
    "huge": (352, (11, 22, 44, 88)),
}


@dataclass(frozen=True)
class BuildPlan:
    """Derived wiring for an encoder/decoder pair."""
    channels_in: int
    channels_out: int
    num_deconv: int
    num_filters: Tuple[int, ...]
    deconv_kernels: Tuple[int, ...]
    num_upscale: int


def build_plan(cfg: ModelConfig) -> BuildPlan:
    b = cfg.backbone
    if "swin" in b:
        variant = next((v for v in SWIN_VARIANTS if v in b), None)
        if variant is None:
            raise ValueError(f"unknown swin variant in backbone '{b}'")
        embed_dim, _ = SWIN_VARIANTS[variant]
        if cfg.model_scale == 32:
            return BuildPlan(embed_dim * 8, embed_dim, 3, (32, 32, 32),
                             (2, 2, 2), 2)
        if cfg.model_scale == 16:
            return BuildPlan(embed_dim * 4, embed_dim, 3, (32, 32, 32),
                             (2, 2, 2), 1)
        raise ValueError(f"model_scale must be 16 or 32, got {cfg.model_scale}")
    if "cnn_transformer" in b or "resnet_only" in b:
        cm = cfg.cnn.cnn_model
        if cm in ("resnet50", "50"):
            return BuildPlan(512, 128, 3, (32, 32, 32), (2, 2, 2), 1)
        if cm in ("resnet18", "18"):
            return BuildPlan(256, 128, 2, (32, 32), (2, 2), 2)
        raise ValueError(f"unknown cnn_model '{cm}'")
    raise ValueError(f"backbone '{b}' is not registered")


def resolve_attn_impl(cfg: ModelConfig) -> str:
    """Attention kernel selection, resolved once at model build (not at
    trace time): explicit cfg.attn_impl wins; otherwise derived from
    use_pallas_attention."""
    if cfg.attn_impl:
        if cfg.attn_impl not in ("xla", "pallas", "pallas_slab"):
            raise ValueError(f"unknown attn_impl '{cfg.attn_impl}'")
        return cfg.attn_impl
    return "pallas" if cfg.use_pallas_attention else "xla"


def _build_encoder(cfg: ModelConfig, dtype) -> nn.Module:
    b = cfg.backbone
    if "swin" in b:
        variant = next(v for v in SWIN_VARIANTS if v in b)
        embed_dim, num_heads = SWIN_VARIANTS[variant]
        s = cfg.swin
        if cfg.model_scale == 32:
            depths, heads = tuple(s.depths), num_heads
            window, pwin = tuple(s.window_size), tuple(s.pretrain_window_size)
            shift = tuple(s.use_shift)
            out_indices = (len(depths) - 1,)
        else:  # 16: drop the last stage (ref models/model.py:52-67)
            depths = tuple(s.depths[:-1])
            heads = num_heads[:len(depths)]
            window = tuple(s.window_size[:len(depths)])
            pwin = tuple(s.pretrain_window_size[:len(depths)])
            shift = tuple(s.use_shift[:len(depths)])
            out_indices = (len(depths) - 1,)
        return SwinTransformerV2(
            embed_dim=embed_dim, depths=depths, num_heads=heads,
            window_size=window, pretrain_window_size=pwin,
            use_shift=shift, out_indices=out_indices,
            drop_path_rate=s.drop_path_rate,
            use_checkpoint=s.use_checkpoint,
            remat_policy=s.remat_policy,
            scan_blocks=s.scan_blocks,
            resident_pad_max=s.resident_pad_max,
            frozen_stages=s.frozen_stages,
            attn_impl=resolve_attn_impl(cfg),
            dtype=dtype, name="encoder")
    hidden = {"resnet50": 512, "50": 512,
              "resnet18": 256, "18": 256}[cfg.cnn.cnn_model]
    cm = "resnet50" if cfg.cnn.cnn_model in ("resnet50", "50") else "resnet18"
    if "cnn_transformer" in b:
        return CnnTransformer(hidden_dim=hidden, n_enc_layers=6,
                              multi_scale=b.endswith("multi_scale"),
                              cnn_model=cm, ff_dim=cfg.cnn.transformer_ff_dim,
                              dtype=dtype, name="encoder")
    return ResNetOnly(hidden_dim=hidden, multi_scale=b.endswith("multi_scale"),
                      cnn_model=cm, dtype=dtype, name="encoder")


class TwoFrameDepthPose(nn.Module):
    """Shared encoder over both frames + twin-headed decoder.

    __call__(frame1, frame2) -> dict with pred_d1/pred_d2 (B, H, W, 1),
    pred_r12/pred_r21 (B, 9), pred_t12/pred_t21 (B, 3) — r21/t21 are None
    for decoder_v1 (ref models/model.py:115-126, decoder_v1.py:182).
    """
    cfg: ModelConfig

    @nn.compact
    def __call__(self, frame1, frame2, train: bool = False,
                 sparse1=None, sparse2=None):
        del sparse1, sparse2  # RGB-only family (see glpdepth_scale16 fusion)
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        plan = build_plan(self.cfg)
        encoder = _build_encoder(self.cfg, dtype)

        # Interleave the two frames on the batch axis ((B,2,...)->(2B,...))
        # instead of concatenating: under data-parallel sharding each device
        # keeps its own pair, so no all-to-all / collective-permute is needed
        # (a batch-dim concat re-distributes halves across the mesh).
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

        if self.cfg.decoder == "decoder_v1":
            decoder = DecoderV1(
                max_depth=self.cfg.max_depth, num_deconv=plan.num_deconv,
                num_filters=plan.num_filters,
                deconv_kernels=plan.deconv_kernels,
                num_upscale=plan.num_upscale,
                out_channels=plan.channels_out,
                dtype=dtype, name="decoder")
        elif self.cfg.decoder == "decoder_v2":
            decoder = DecoderV2(
                max_depth=self.cfg.max_depth, num_deconv=plan.num_deconv,
                num_filters=plan.num_filters,
                deconv_kernels=plan.deconv_kernels,
                num_upscale=plan.num_upscale,
                out_channels=plan.channels_out * 2,
                dtype=dtype, name="decoder")
        else:
            raise ValueError(f"unknown decoder '{self.cfg.decoder}'")

        d1, r12, t12, d2, r21, t21 = decoder(f1, f2, train)
        return {
            "pred_d1": d1, "pred_d2": d2,
            "pred_r12": r12, "pred_r21": r21,
            "pred_t12": t12, "pred_t21": t21,
        }


def build_model(cfg: ModelConfig) -> nn.Module:
    """Model factory over the three families (cfg.family):
    two_frame (IDEDepth equivalent), glpdepth_scale16 (fused out_p custom
    network with optional sparse-depth fusion), glpdepth (legacy
    single-frame)."""
    if cfg.family == "glpdepth":
        from mmde_tpu.models.glpdepth import GLPDepth
        return GLPDepth(cfg=cfg)
    if cfg.family == "glpdepth_scale16":
        from mmde_tpu.models.glpdepth import Scale16TwoFrame
        return Scale16TwoFrame(cfg=cfg)
    return TwoFrameDepthPose(cfg=cfg)

"""PyTorch -> flax weight conversion for pretrained backbones.

Capability parity with reference models/checkpoint.py (608 lines):
  * load SimMIM / MoBY SwinV2 checkpoints, strip `module.` / `encoder.` /
    `backbone.` prefixes (ref :354-359);
  * map every SwinV2 parameter into our flax pytree (conv OIHW->HWIO,
    linear transpose, LayerNorm weight->scale);
  * interpolate `relative_position_bias_table` between window sizes —
    bicubic or geometric-progression resampling (ref :372-437) — needed only
    for the discrete-table RPE variant; the continuous MLP-RPE
    (`rpe_mlp` -> rpe_fc1/rpe_fc2) transfers across window sizes by
    construction and is copied directly;
  * torchvision ResNet-18/50 conversion with BatchNorm statistics for the
    cnn_transformer / resnet_only encoders (ref cnn_transformer.py:29-33
    relies on torchvision pretrained=True);
  * non-strict application with a missing/unexpected-key report
    (ref :73-138).

All numeric work is numpy; torch is only needed to unpickle .pth files.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# generic helpers
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Unpickle a .pth/.ckpt file to {name: np.ndarray}. Handles the usual
    wrapper keys ('model', 'state_dict', 'model_state_dict')."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def strip_prefixes(sd: Dict[str, np.ndarray],
                   prefixes=("module.", "encoder.", "backbone.")
                   ) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray,
         report: List[str]):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def deconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kH, kW) -> flax ConvTranspose
    HWIO (kH, kW, in, out), SPATIALLY FLIPPED.

    torch's transposed conv is the gradient of a strided correlation (taps
    reversed); flax's ConvTranspose applies the kernel unflipped, so the
    torch-equivalent flax kernel is the spatial reverse. Without the flip
    every 2x2 output block of a k2s2 deconv comes out mirrored — invisible
    to randomized eval-mode oracles (BN running stats drown the spatial
    signal) but a real train-mode divergence (see nn.layers.torch_deconv
    and tests/test_training_oracle.py)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return np.transpose(w)


# ---------------------------------------------------------------------------
# relative position bias table interpolation (discrete-table RPE)
# ---------------------------------------------------------------------------

def interpolate_rpe_table(table: np.ndarray, src_window: int, dst_window: int,
                          mode: str = "geo") -> np.ndarray:
    """Resample a ((2*s-1)^2, nH) bias table to ((2*d-1)^2, nH).

    mode="bicubic" resamples on the uniform grid; mode="geo" resamples on a
    geometric-progression coordinate grid so that the outer (rarely-trained)
    offsets stretch smoothly — the scheme the reference defaults to
    (checkpoint.py:372-437, rpe_interpolation='geo').
    """
    from scipy import interpolate as si
    s = 2 * src_window - 1
    d = 2 * dst_window - 1
    nH = table.shape[1]
    t = table.reshape(s, s, nH)

    if mode == "bicubic":
        src = np.linspace(-1, 1, s)
        dst = np.linspace(-1, 1, d)
    else:  # geometric progression coordinates
        def geo_coords(n, target_half):
            # find q with 1 + q + ... + q^(n/2-1) = target_half
            half = n // 2
            lo, hi = 1.0001, 1.5
            for _ in range(100):
                q = (lo + hi) / 2
                total = (q ** half - 1) / (q - 1)
                if total > target_half:
                    hi = q
                else:
                    lo = q
            q = (lo + hi) / 2
            pts = [0.0]
            step = 1.0
            for _ in range(half):
                pts.append(pts[-1] + step)
                step *= q
            pts = np.array(pts[1:])
            return np.concatenate([-pts[::-1], [0.0], pts])
        src = geo_coords(s - 1, (s - 1) // 2)
        src = src / src.max()
        dst_half = np.arange(1, d // 2 + 1, dtype=np.float64)
        dst = np.concatenate([-dst_half[::-1], [0.0], dst_half])
        dst = dst / dst.max()

    out = np.zeros((d, d, nH), table.dtype)
    for h in range(nH):
        f = si.RectBivariateSpline(src, src, t[:, :, h], kx=3, ky=3)
        out[:, :, h] = f(dst, dst)
    return out.reshape(d * d, nH)


# ---------------------------------------------------------------------------
# SwinV2
# ---------------------------------------------------------------------------

_LN = lambda *p: p + ("LayerNorm_0",)     # our LayerNormFP32 nests a LayerNorm


def convert_swin(sd: Dict[str, np.ndarray],
                 dst_windows: Optional[Dict[int, int]] = None,
                 rpe_interpolation: str = "geo"):
    """Torch SwinV2 state dict -> (params dict, report list).

    dst_windows: {stage: window_size} for RPE-table interpolation when the
    fine-tune windows differ from pretraining (only used for the discrete
    relative_position_bias_table variant).
    """
    sd = strip_prefixes(sd)
    params: dict = {}
    report: List[str] = []

    def put(path, value):
        _set(params, path, value, report)

    for name, w in sd.items():
        if name.endswith("relative_position_index") or \
                name.endswith("relative_coords_table") or \
                name.endswith("attn_mask"):
            continue  # static buffers we recompute
        parts = name.split(".")
        try:
            if name.startswith("patch_embed"):
                if parts[1] == "proj":
                    put(("patch_embed", "proj",
                         "kernel" if parts[2] == "weight" else "bias"),
                        conv_kernel(w) if parts[2] == "weight" else w)
                elif parts[1] == "norm":
                    put(_LN("patch_embed", "norm") +
                        ("scale" if parts[2] == "weight" else "bias",), w)
                continue
            if name == "absolute_pos_embed":
                # (1, C, H, W) -> (1, H, W, C)
                put(("absolute_pos_embed",), np.transpose(w, (0, 2, 3, 1)))
                continue
            m = re.match(r"norm(\d+)\.(weight|bias)$", name)
            if m:
                put(_LN(f"norm{m.group(1)}",) +
                    ("scale" if m.group(2) == "weight" else "bias",), w)
                continue
            m = re.match(r"layers\.(\d+)\.(.*)", name)
            if not m:
                report.append(f"unmapped: {name}")
                continue
            stage, rest = int(m.group(1)), m.group(2)
            rp = rest.split(".")
            base = (f"layers_{stage}",)
            if rp[0] == "downsample":
                if rp[1] == "reduction":
                    val = conv_kernel(w) if w.ndim == 4 else linear_kernel(w)
                    put(base + ("downsample", "reduction",
                                "kernel" if rp[2] == "weight" else "bias"), val)
                elif rp[1] == "norm":
                    put(_LN(*base, "downsample", "norm") +
                        ("scale" if rp[2] == "weight" else "bias",), w)
                continue
            if rp[0] != "blocks":
                report.append(f"unmapped: {name}")
                continue
            blk = base + (f"blocks_{int(rp[1])}",)
            tail = rp[2:]
            if tail[0] in ("norm1", "norm2", "enorm"):
                put(_LN(*blk, tail[0]) +
                    ("scale" if tail[1] == "weight" else "bias",), w)
            elif tail[0] == "attn":
                a = blk + ("attn",)
                if tail[1] == "qkv":
                    put(a + ("qkv", "kernel"), linear_kernel(w))
                elif tail[1] in ("q_bias", "v_bias", "logit_scale"):
                    put(a + (tail[1],), w)
                elif tail[1] == "proj":
                    put(a + ("proj", "kernel" if tail[2] == "weight"
                             else "bias"),
                        linear_kernel(w) if tail[2] == "weight" else w)
                elif tail[1] == "rpe_mlp":
                    # Sequential: 0 = fc1 (Linear), 2 = fc2 (LinearFP32)
                    layer = "rpe_fc1" if tail[2] == "0" else "rpe_fc2"
                    put(a + (layer, "kernel" if tail[3] == "weight"
                             else "bias"),
                        linear_kernel(w) if tail[3] == "weight" else w)
                elif tail[1] == "relative_position_bias_table":
                    src_win = int(round((np.sqrt(w.shape[0]) + 1) / 2))
                    dst_win = (dst_windows or {}).get(stage, src_win)
                    if dst_win != src_win:
                        w = interpolate_rpe_table(w, src_win, dst_win,
                                                  rpe_interpolation)
                    put(a + ("relative_position_bias_table",), w)
                else:
                    report.append(f"unmapped: {name}")
            elif tail[0] == "mlp":
                put(blk + ("mlp", tail[1], "kernel" if tail[2] == "weight"
                           else "bias"),
                    linear_kernel(w) if tail[2] == "weight" else w)
            elif tail[0] in ("gamma_1", "gamma_2"):
                put(blk + (tail[0],), w)
            else:
                report.append(f"unmapped: {name}")
        except Exception as e:                        # pragma: no cover
            report.append(f"error on {name}: {e}")
    return params, report


# ---------------------------------------------------------------------------
# torchvision ResNet
# ---------------------------------------------------------------------------

def convert_resnet(sd: Dict[str, np.ndarray]):
    """torchvision resnet18/50 state dict -> (params, batch_stats, report)
    matching mmde_tpu.nn.resnet.ResNetFeatures naming."""
    sd = strip_prefixes(sd)
    params: dict = {}
    stats: dict = {}
    report: List[str] = []

    def put(tree, path, value):
        _set(tree, path, value, report)

    def bn(dst, src):
        put(params, dst + ("scale",), sd[src + ".weight"])
        put(params, dst + ("bias",), sd[src + ".bias"])
        put(stats, dst + ("mean",), sd[src + ".running_mean"])
        put(stats, dst + ("var",), sd[src + ".running_var"])

    if "conv1.weight" in sd:
        put(params, ("stem_conv", "kernel"), conv_kernel(sd["conv1.weight"]))
        bn(("stem_bn",), "bn1")

    for name in sd:
        m = re.match(r"layer(\d+)\.(\d+)\.conv(\d+)\.weight$", name)
        if m:
            stage, block, conv = m.groups()
            dst = (f"layer{stage}_{block}",)
            put(params, dst + (f"conv{conv}", "kernel"), conv_kernel(sd[name]))
            bn(dst + (f"bn{conv}",), f"layer{stage}.{block}.bn{conv}")
        m = re.match(r"layer(\d+)\.(\d+)\.downsample\.0\.weight$", name)
        if m:
            stage, block = m.groups()
            dst = (f"layer{stage}_{block}",)
            put(params, dst + ("downsample", "kernel"), conv_kernel(sd[name]))
            bn(dst + ("downsample_bn",), f"layer{stage}.{block}.downsample.1")
    return params, stats, report


# ---------------------------------------------------------------------------
# cnn_transformer / resnet_only encoders
# ---------------------------------------------------------------------------

def _resequence_trunk(sd: Dict[str, np.ndarray], multi_scale: bool
                      ) -> Dict[str, np.ndarray]:
    """Undo the reference's `nn.Sequential(*resnet.children())` slicing
    (cnn_transformer.py:39-48): map `backbone.feature3.4.0.conv1.weight`
    style names back to torchvision's `layer1.0.conv1.weight` so
    convert_resnet applies unchanged."""
    if multi_scale:
        seq = {"feature3.0": "conv1", "feature3.1": "bn1",
               "feature3.4": "layer1", "feature3.5": "layer2",
               "feature4.0": "layer3", "feature5.0": "layer4"}
    else:
        seq = {"feature.0": "conv1", "feature.1": "bn1",
               "feature.4": "layer1", "feature.5": "layer2",
               "feature.6": "layer3"}
    out = {}
    for k, v in sd.items():
        for src, dst in seq.items():
            if k.startswith(src + "."):
                out[dst + k[len(src):]] = v
                break
    return out


def convert_cnn_transformer(sd: Dict[str, np.ndarray], *,
                            multi_scale: bool = True,
                            num_heads: Optional[int] = None):
    """Reference cnn_transformer / resnet_only state dict -> (params,
    batch_stats, report) matching mmde_tpu.nn.cnn_transformer naming
    (CnnTransformer / ResNetOnly). Covers the ResNet trunk, the per-scale
    squeeze convs + fusion (ref cnn_transformer.py:87-128), and the
    nn.MultiheadAttention encoder layers (ref :192-231, packed in_proj
    split into per-head q/k/v kernels)."""
    sd = strip_prefixes(sd, ("module.",))
    params: dict = {}
    stats: dict = {}
    report: List[str] = []

    fe = "feature_extractor."
    trunk_sd = {k[len(fe + "backbone."):]: v for k, v in sd.items()
                if k.startswith(fe + "backbone.")}
    rparams, rstats, rreport = convert_resnet(
        _resequence_trunk(trunk_sd, multi_scale))
    params["feature_extractor"] = {"backbone": {"trunk": rparams}}
    stats["feature_extractor"] = {"backbone": {"trunk": rstats}}
    report += rreport

    def put(tree, path, value):
        _set(tree, path, value, report)

    def bn(dst, src):
        put(params, dst + ("scale",), sd[src + ".weight"])
        put(params, dst + ("bias",), sd[src + ".bias"])
        put(stats, dst + ("mean",), sd[src + ".running_mean"])
        put(stats, dst + ("var",), sd[src + ".running_var"])

    def conv_bn_relu(dst, src):
        put(params, dst + ("conv", "kernel"), conv_kernel(sd[src + ".conv.weight"]))
        bn(dst + ("bn",), src + ".bn")

    if multi_scale:
        for i in (1, 2, 3):
            for j, suffix in ((0, "a"), (1, "b")):
                conv_bn_relu(("feature_extractor", f"squeeze{i}_{suffix}"),
                             f"{fe}feat_squeeze{i}.{j}")
        comb = fe + "feat_combine"
        put(params, ("feature_extractor", "combine_a", "kernel"),
            conv_kernel(sd[comb + ".0.weight"]))
        put(params, ("feature_extractor", "combine_a", "bias"),
            sd[comb + ".0.bias"])
        bn(("feature_extractor", "BatchNorm_0"), comb + ".1")
        put(params, ("feature_extractor", "combine_b", "kernel"),
            conv_kernel(sd[comb + ".3.weight"]))
        put(params, ("feature_extractor", "combine_b", "bias"),
            sd[comb + ".3.bias"])
    else:
        for j, suffix in ((0, "a"), (1, "b")):
            conv_bn_relu(("feature_extractor", f"squeeze_{suffix}"),
                         f"{fe}feat_squeeze.{j}")

    # transformer encoder layers (absent for resnet_only)
    layer_ids = sorted({int(k.split(".")[1]) for k in sd
                        if k.startswith("transformer_encoder.")})
    for i in layer_ids:
        src = f"transformer_encoder.{i}"
        dst = (f"enc_{i}",)
        w = sd[src + ".self_attn.in_proj_weight"]      # (3C, C), rows q;k;v
        b = sd[src + ".self_attn.in_proj_bias"]
        C = w.shape[1]
        nh = num_heads if num_heads else (4 if C == 256 else 8)
        hd = C // nh
        for name, wi, bi in (("query", 0, 0), ("key", 1, 1), ("value", 2, 2)):
            put(params, dst + ("self_attn", name, "kernel"),
                w[wi * C:(wi + 1) * C].T.reshape(C, nh, hd))
            put(params, dst + ("self_attn", name, "bias"),
                b[bi * C:(bi + 1) * C].reshape(nh, hd))
        ow = sd[src + ".self_attn.out_proj.weight"]    # (C, C)
        put(params, dst + ("self_attn", "out", "kernel"),
            ow.T.reshape(nh, hd, C))
        put(params, dst + ("self_attn", "out", "bias"),
            sd[src + ".self_attn.out_proj.bias"])
        for norm in ("norm1", "norm2"):
            put(params, dst + (norm, "scale"), sd[f"{src}.{norm}.weight"])
            put(params, dst + (norm, "bias"), sd[f"{src}.{norm}.bias"])
        for ffn in ("ffn1", "ffn2"):
            put(params, dst + (ffn, "kernel"),
                linear_kernel(sd[f"{src}.{ffn}.0.weight"]))
            put(params, dst + (ffn, "bias"), sd[f"{src}.{ffn}.0.bias"])

    return params, stats, report


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------

def apply_pretrained(target: dict, pretrained: dict, path=()
                     ) -> Tuple[dict, List[str], List[str]]:
    """Overlay `pretrained` onto `target` non-strictly. Returns
    (merged, missing_keys, unexpected_keys) — the reference's load report
    (checkpoint.py:117-138)."""
    missing: List[str] = []
    unexpected: List[str] = []

    def walk(tgt, pre, path):
        out = {}
        for k, v in tgt.items():
            if isinstance(v, dict):
                sub = pre.get(k, {}) if isinstance(pre, dict) else {}
                out[k] = walk(v, sub, path + (k,))
            else:
                pv = pre.get(k) if isinstance(pre, dict) else None
                if pv is None:
                    missing.append("/".join(path + (k,)))
                    out[k] = v
                elif tuple(np.shape(pv)) != tuple(np.shape(v)):
                    missing.append("/".join(path + (k,)) +
                                   f" (shape {np.shape(pv)} vs {np.shape(v)})")
                    out[k] = v
                else:
                    out[k] = np.asarray(pv, dtype=np.asarray(v).dtype)
        return out

    def find_unexpected(pre, tgt, path):
        if not isinstance(pre, dict):
            return
        for k, v in pre.items():
            if isinstance(v, dict):
                find_unexpected(v, tgt.get(k, {}) if isinstance(tgt, dict)
                                else {}, path + (k,))
            elif not (isinstance(tgt, dict) and k in tgt):
                unexpected.append("/".join(path + (k,)))

    merged = walk(target, pretrained, ())
    find_unexpected(pretrained, target, ())
    return merged, missing, unexpected

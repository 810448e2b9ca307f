"""Pretrained-backbone loading glue.

Reference: `encoder.init_weights(pretrained=args.pretrained)` with SimMIM
SwinV2 checkpoints (models/model.py:50,68 -> checkpoint.py:318) and
torchvision `pretrained=True` ResNets (cnn_transformer.py:29,33). Here:
convert the torch state dict and overlay it non-strictly onto the flax
params of the encoder subtree, reporting missing/unexpected keys.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax

from mmde_tpu.config import ModelConfig
from mmde_tpu.ckpt import torch_convert as tc


def detect_scan_stages(swin_tree: dict):
    """Stage indices whose param subtree uses the scanned (stacked) block
    layout — i.e. `layers_{i}` contains `blocks_scan`."""
    out = []
    for k, v in swin_tree.items():
        if k.startswith("layers_") and isinstance(v, dict) \
                and "blocks_scan" in v:
            out.append(int(k.split("_")[1]))
    return sorted(out)


def load_pretrained(params: dict, batch_stats: dict, cfg: ModelConfig,
                    path: str, rpe_interpolation: str = "geo",
                    verbose: bool = True) -> Tuple[dict, dict]:
    """Overlay pretrained encoder weights; returns (params, batch_stats)."""
    if not path or not os.path.exists(path):
        if verbose and path:
            print(f"[pretrained] checkpoint not found: {path} (skipping)")
        return params, batch_stats

    sd = tc.load_torch_state_dict(path)
    params = jax.tree.map(lambda x: x, params)  # shallow copy-able dicts
    enc_key = "encoder"
    target_root = params
    if enc_key not in target_root and "net" in target_root:
        target_root = target_root["net"]         # Scale16TwoFrame adapter

    if "swin" in cfg.backbone:
        dst_windows = {i: w for i, w in enumerate(cfg.swin.window_size)}
        converted, report = tc.convert_swin(sd, dst_windows=dst_windows,
                                            rpe_interpolation=rpe_interpolation)
        # scan_blocks models store stage blocks stacked (blocks_scan/block
        # with a leading depth axis); converted checkpoints arrive in the
        # unstacked blocks_{i} layout — restack for the stages the target
        # tree actually scans.
        scan_stages = detect_scan_stages(target_root[enc_key])
        if scan_stages:
            from mmde_tpu.nn.swin_v2 import to_scanned_layout
            converted = to_scanned_layout(converted, scan_stages)
        merged, missing, unexpected = tc.apply_pretrained(
            jax.tree.map(lambda x: x, target_root[enc_key]), converted)
        target_root[enc_key] = merged
    else:
        converted, stats, report = tc.convert_resnet(sd)
        # resnet trunk lives at encoder/feature_extractor/backbone/trunk
        node = target_root[enc_key]
        for k in ("feature_extractor", "backbone", "trunk"):
            node = node[k]
        merged, missing, unexpected = tc.apply_pretrained(
            jax.tree.map(lambda x: x, node), converted)
        target_root[enc_key]["feature_extractor"]["backbone"]["trunk"] = merged
        # overlay running statistics too
        try:
            bs_node = batch_stats["encoder"]["feature_extractor"][
                "backbone"]["trunk"]
            merged_bs, _, _ = tc.apply_pretrained(
                jax.tree.map(lambda x: x, bs_node), stats)
            batch_stats["encoder"]["feature_extractor"]["backbone"][
                "trunk"] = merged_bs
        except KeyError:
            pass

    if verbose:
        print(f"[pretrained] loaded {path}: "
              f"{len(missing)} missing, {len(unexpected)} unexpected")
        for m in missing[:8]:
            print("  missing:", m)
        for u in unexpected[:8]:
            print("  unexpected:", u)
        for r in report[:8]:
            print("  note:", r)
    return params, batch_stats

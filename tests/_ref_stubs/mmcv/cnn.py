"""mmcv.cnn builder stand-ins with mmcv-lite semantics for the configs the
reference actually uses (decoder_v1/v2: plain conv / BN / deconv)."""
import torch.nn as nn


def build_conv_layer(cfg, *args, **kwargs):
    assert cfg is None or cfg.get("type", "Conv2d") == "Conv2d", cfg
    return nn.Conv2d(*args, **kwargs)


def build_norm_layer(cfg, num_features, postfix=""):
    assert cfg is None or cfg.get("type", "BN") == "BN", cfg
    return f"bn{postfix}", nn.BatchNorm2d(num_features)


def build_upsample_layer(cfg, *args, **kwargs):
    assert cfg.get("type") == "deconv", cfg
    return nn.ConvTranspose2d(*args, **kwargs)


def constant_init(module, val, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.constant_(module.weight, val)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def normal_init(module, mean=0, std=1, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.normal_(module.weight, mean, std)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)

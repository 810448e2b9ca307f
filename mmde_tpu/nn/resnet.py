"""ResNet-18/50 backbones (flax.linen, NHWC).

Provides the torchvision-equivalent feature extractors the reference builds
from `models.resnet50/resnet18` (cnn_transformer.py:24-83, resnet_only.py):
  * multi_scale=True  -> (f3, f4, f5) at strides 8/16/32
  * multi_scale=False -> single stride-16 feature (through layer3)

Channel counts match torchvision so pretrained weights convert 1:1
(ckpt/torch_convert.py): resnet50 (512, 1024, 2048); resnet18 (128, 256, 512).

3x3 convs use explicit torch-style padding (1,1) rather than flax "SAME":
for stride 2 on even extents SAME pads (0,1), which shifts the sampling
grid one pixel off torch's — misaligning the residual add against the 1x1
stride-2 downsample branch and breaking torchvision-weight parity.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from mmde_tpu.nn.layers import TorchBatchNorm

Dtype = Any


def _bn(name: str, dtype: Dtype = jnp.float32) -> TorchBatchNorm:
    # stats/normalization in fp32, output cast to the activation dtype
    return TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype,
                          name=name)


class BasicBlock(nn.Module):
    """ResNet-18/34 block: two 3x3 convs."""
    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        ura = not train
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_bn("bn1", self.dtype)(y, use_running_average=ura))
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _bn("bn2", self.dtype)(y, use_running_average=ura)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample")(x)
            residual = _bn("downsample_bn", self.dtype)(residual, use_running_average=ura)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """ResNet-50 block: 1x1 -> 3x3 -> 1x1 (x4 expansion)."""
    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        ura = not train
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_bn("bn1", self.dtype)(y, use_running_average=ura))
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(_bn("bn2", self.dtype)(y, use_running_average=ura))
        y = nn.Conv(4 * self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = _bn("bn3", self.dtype)(y, use_running_average=ura)
        if residual.shape != y.shape:
            residual = nn.Conv(4 * self.features, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample")(x)
            residual = _bn("downsample_bn", self.dtype)(residual, use_running_average=ura)
        return nn.relu(y + residual)


_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
}


class ResNetFeatures(nn.Module):
    """Stem + layer1..layer4 trunk, emitting the stage features the depth
    encoders consume. `num_stages` limits how deep to run (3 => stride 16)."""
    model: str = "resnet50"                 # "resnet18" | "resnet50"
    num_stages: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, depths = _SPECS[self.model]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(_bn("stem_bn", self.dtype)(x, use_running_average=not train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        features = 64
        for stage in range(self.num_stages):
            stride = 1 if stage == 0 else 2
            for b in range(depths[stage]):
                x = block_cls(features=features,
                              strides=stride if b == 0 else 1,
                              dtype=self.dtype,
                              name=f"layer{stage + 1}_{b}")(x, train)
            feats.append(x)
            features *= 2
        return feats


class ResNetMultiScale(nn.Module):
    """(f3, f4, f5) at strides 8/16/32 (ref cnn_transformer.py:24-56)."""
    model: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNetFeatures(model=self.model, num_stages=4,
                               dtype=self.dtype, name="trunk")(x, train)
        return feats[1], feats[2], feats[3]

    @property
    def num_channels(self):
        return ((128, 256, 512) if self.model == "resnet18"
                else (512, 1024, 2048))


class ResNetSingleScale(nn.Module):
    """Single stride-16 feature, trunk cut after layer3
    (ref cnn_transformer.py:58-83)."""
    model: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNetFeatures(model=self.model, num_stages=3,
                               dtype=self.dtype, name="trunk")(x, train)
        return feats[2]

    @property
    def num_channels(self):
        return 256 if self.model == "resnet18" else 1024

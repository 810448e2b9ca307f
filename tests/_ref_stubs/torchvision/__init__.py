"""torchvision stub: reference models/checkpoint.py:21 imports it for
model-zoo URL loading (never exercised by the oracles), and
cnn_transformer.py/resnet_only.py import `torchvision.models` for the
ResNet trunks — served by the hand-rolled stand-in in models.py."""
from . import models  # noqa: F401

__version__ = "0.0-stub"

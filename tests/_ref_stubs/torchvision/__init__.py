"""torchvision stub: reference models/checkpoint.py:21 imports it only for
model-zoo URL loading, which the oracle tests never exercise."""
__version__ = "0.0-stub"

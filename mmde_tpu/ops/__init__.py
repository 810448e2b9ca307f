"""TPU compute kernels: Pallas implementations + XLA reference paths."""

from mmde_tpu.ops.window_attention import (  # noqa: F401
    cosine_window_attention,
    scaled_window_attention,
)

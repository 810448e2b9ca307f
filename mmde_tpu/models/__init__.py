"""Model registry and two-frame assembly."""

from mmde_tpu.models.two_frame import (  # noqa: F401
    TwoFrameDepthPose, build_model, SWIN_VARIANTS)

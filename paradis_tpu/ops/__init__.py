from paradis_tpu.ops.blocks import (
    BLOCK_REGISTRY,
    ChannelNorm,
    CLinear,
    GlobalBias,
    GMBlock,
    PhysicalDownsample,
    SepConv,
)
from paradis_tpu.ops.resize import (
    bilinear_resize_align_corners,
    linear_interp_matrix,
    periodic_upsample,
)

__all__ = [
    "BLOCK_REGISTRY",
    "CLinear",
    "SepConv",
    "ChannelNorm",
    "GlobalBias",
    "GMBlock",
    "PhysicalDownsample",
    "bilinear_resize_align_corners",
    "linear_interp_matrix",
    "periodic_upsample",
]

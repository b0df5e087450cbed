"""L0 compute primitives: XLA/Pallas equivalents of the reference CUDA ops."""

from .bias_act import activation_funcs, bias_act
from .conv2d_resample import conv2d_resample
from .filtered_lrelu import filtered_lrelu
from .fma import fma
from .grid_sample import grid_sample_2d, grid_sample_3d
from .interpolate import interpolate_bilinear
from .upfirdn2d import (
    downsample2d,
    filter2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)

__all__ = [
    "activation_funcs",
    "bias_act",
    "conv2d_resample",
    "downsample2d",
    "filter2d",
    "filtered_lrelu",
    "fma",
    "grid_sample_2d",
    "grid_sample_3d",
    "interpolate_bilinear",
    "setup_filter",
    "upfirdn2d",
    "upsample2d",
]

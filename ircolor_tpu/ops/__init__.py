"""NHWC building-block ops (layer L1 of the reference, SURVEY.md §1).

Everything here is functional JAX on NHWC tensors (TPU-native layout),
jit-safe with static shapes. Flax modules in ``ircolor_tpu.models`` compose
these.
"""

from ircolor_tpu.ops.padding import pad2d, reflect_pad2d
from ircolor_tpu.ops.filters import binomial_filter_1d, binomial_filter_2d, gaussian_window_1d
from ircolor_tpu.ops.norm import instance_norm
from ircolor_tpu.ops.resize import bilinear_align_corners, upsample2x_align_corners
from ircolor_tpu.ops.blurpool import blur_downsample, blur_upsample_aa
from ircolor_tpu.ops.conv import conv2d, depthwise_conv2d

__all__ = [
    "pad2d",
    "reflect_pad2d",
    "binomial_filter_1d",
    "binomial_filter_2d",
    "gaussian_window_1d",
    "instance_norm",
    "bilinear_align_corners",
    "upsample2x_align_corners",
    "blur_downsample",
    "blur_upsample_aa",
    "conv2d",
    "depthwise_conv2d",
]

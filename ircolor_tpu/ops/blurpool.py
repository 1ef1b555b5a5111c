"""Anti-aliased blur-pool down/upsampling (NHWC).

Reference semantics:

* ``Downsample`` (`/root/reference/Code/ir_colorization.py:269-310`):
  pad (reflect/replicate/zero) by ``floor/ceil((filt_size-1)/2 + pad_off)``
  on each side, then depthwise-convolve with the fixed binomial filter at
  ``stride`` (default 2). For the default ``filt_size=3`` the pad is
  (1,1,1,1) and even inputs halve exactly.

* ``UpsampleAA`` (ref :313-355): bilinear ×stride upsample with
  ``align_corners=True``, then pad + depthwise binomial blur at stride 1
  (same spatial size out).

Both use one shared K×K filter per channel (a buffer, not a parameter), so
they are pure functions here — no Flax params involved.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ircolor_tpu.ops.conv import depthwise_conv2d
from ircolor_tpu.ops.filters import binomial_filter_2d
from ircolor_tpu.ops.padding import pad2d
from ircolor_tpu.ops.resize import bilinear_align_corners


def _blur_pad_sizes(filt_size: int, pad_off: int = 0) -> tuple[int, int, int, int]:
    """(left, right, top, bottom) pad, floor/ceil asymmetric (ref :283-289)."""
    pad = (filt_size - 1) / 2.0
    lo = int(pad + pad_off)
    hi = int(math.ceil(pad + pad_off))
    return (lo, hi, lo, hi)


def blur_downsample(
    x: jnp.ndarray,
    *,
    filt_size: int = 3,
    stride: int = 2,
    pad_type: str = "reflect",
    pad_off: int = 0,
    precision=None,
) -> jnp.ndarray:
    """Pad + depthwise binomial blur at stride (ref Downsample.forward :307-310)."""
    filt = binomial_filter_2d(filt_size)
    y = pad2d(x, _blur_pad_sizes(filt_size, pad_off), pad_type)
    return depthwise_conv2d(y, filt, stride=stride, padding="VALID", precision=precision)


def blur_upsample_aa(
    x: jnp.ndarray,
    *,
    filt_size: int = 3,
    stride: int = 2,
    pad_type: str = "reflect",
    precision=None,
) -> jnp.ndarray:
    """Bilinear ×stride (align_corners=True) + pad + depthwise blur stride 1
    (ref UpsampleAA.forward :350-355)."""
    _, h, w, _ = x.shape
    y = bilinear_align_corners(x, (h * stride, w * stride))
    filt = binomial_filter_2d(filt_size)
    y = pad2d(y, _blur_pad_sizes(filt_size), pad_type)
    return depthwise_conv2d(y, filt, stride=1, padding="VALID", precision=precision)

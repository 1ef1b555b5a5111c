"""Thin NHWC/HWIO convolution wrappers over ``lax.conv_general_dilated``.

The reference reaches cuDNN through ``F.conv2d`` on NCHW/OIHW tensors
(`/root/reference/Code/ir_colorization.py:309, 354, 727-736`); here the
TPU-native layout is NHWC activations with HWIO kernels so XLA tiles directly
onto the MXU without layout transposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")

_PRECISIONS = {
    "default": None,
    "highest": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
}


def resolve_precision(name: str | None):
    if name is None:
        return None
    return _PRECISIONS[name]


def conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    stride: int | tuple[int, int] = 1,
    padding: str | int | tuple[tuple[int, int], tuple[int, int]] = "VALID",
    feature_group_count: int = 1,
    precision=None,
) -> jnp.ndarray:
    """2-D convolution on NHWC input with an HWIO kernel."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=padding,
        dimension_numbers=_DIMS,
        feature_group_count=feature_group_count,
        precision=precision,
    )


def depthwise_conv2d(
    x: jnp.ndarray,
    filt_2d: jnp.ndarray,
    *,
    stride: int = 1,
    padding: str | int | tuple[tuple[int, int], tuple[int, int]] = "VALID",
    precision=None,
) -> jnp.ndarray:
    """Depthwise conv applying one shared K×K filter to every channel.

    Matches the reference's per-channel blur:
    ``F.conv2d(x, filt.repeat(C,1,1,1), groups=C)`` (ref :307-310, :350-355).
    ``filt_2d`` is a K×K array shared across all channels.
    """
    c = x.shape[-1]
    k = jnp.asarray(filt_2d, dtype=x.dtype)
    kernel = jnp.broadcast_to(k[:, :, None, None], (*k.shape, 1, c))
    return conv2d(
        x,
        kernel,
        stride=stride,
        padding=padding,
        feature_group_count=c,
        precision=precision,
    )

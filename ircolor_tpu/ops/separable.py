"""Separable filtering via shift-and-add (TPU-native depthwise filters).

Every fixed filter in this workload is separable: the binomial blur-pool
kernel (Pascal row ⊗ Pascal row, ref `/root/reference/Code/
ir_colorization.py:264`), the 11×11 SSIM Gaussian (outer product of a 1-D
Gaussian, ref :706-711), and scikit-image's 7×7 uniform SSIM window. The
reference applies them as grouped ``F.conv2d(..., groups=C)`` — fine on
cuDNN, but on TPU a depthwise conv with few channels uses C/128 of the MXU
lanes (the metric path runs at C=3!). A separable filter is instead K
shifted multiply-adds per axis on the VPU, independent of channel count, and
XLA fuses the adds into one pass.

``separable_filter2d`` matches ``depthwise_conv2d(x, w1d⊗w1d)`` exactly for
zero ("same"-style) and valid padding; callers needing reflect padding pad
first (as the blur-pool does).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _filter_axis(x: jnp.ndarray, w: np.ndarray, axis: int, stride: int = 1) -> jnp.ndarray:
    """VALID 1-D correlation along ``axis`` via shifted weighted slices."""
    k = len(w)
    size = x.shape[axis]
    out_len = size - k + 1
    acc = None
    for i, wi in enumerate(np.asarray(w, dtype=np.float32)):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + out_len, stride)
        term = x[tuple(sl)] * jnp.asarray(wi, dtype=x.dtype)
        acc = term if acc is None else acc + term
    return acc


def separable_filter2d(
    x: jnp.ndarray,
    w_h: np.ndarray,
    w_w: np.ndarray | None = None,
    *,
    padding: str = "valid",
    stride: int = 1,
    axes: tuple[int, int] = (1, 2),
) -> jnp.ndarray:
    """Apply the separable filter w_h ⊗ w_w per channel along ``axes``.

    Default axes (1, 2) = NHWC spatial dims; metrics paths use (2, 3) on
    channel-first tensors so the wide W axis sits in the TPU lane dimension.
    padding: "valid" (output shrinks by K−1) or "same" (zero-padded, matching
    ``F.conv2d(..., padding=K//2)`` for odd K). ``stride`` applies to both
    filtered axes (after padding), matching a strided depthwise conv.
    """
    if w_w is None:
        w_w = w_h
    ax_h, ax_w = axes
    if padding == "same":
        widths = [(0, 0)] * x.ndim
        widths[ax_h] = (len(w_h) // 2,) * 2
        widths[ax_w] = (len(w_w) // 2,) * 2
        x = jnp.pad(x, widths)
    elif padding != "valid":
        raise ValueError(f"unsupported padding: {padding}")
    y = _filter_axis(x, w_h, axis=ax_h, stride=stride)
    return _filter_axis(y, w_w, axis=ax_w, stride=stride)

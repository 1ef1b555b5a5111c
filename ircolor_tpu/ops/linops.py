"""Per-axis linear operators as MXU matmuls.

The generator's resampling ops are all LINEAR and separable per spatial
axis: align-corners bilinear resize (ref `/root/reference/Code/
ir_colorization.py:351-352, 555-556`), the binomial blur with
reflect/replicate/zero boundary padding (ref :269-355), and their
compositions (UpsampleAA = blur ∘ bilinear×2; Downsample = stride ∘ blur ∘
pad). Measured on v5e (batch 16, 512×640-class shapes), the gather-lerp
upsample costs 60–64 ms while the same op as two axis matmuls costs
9–16 ms: gathers are lane-hostile, dense (out×in) matrices ride the MXU.

So each op builds a static (out_size × in_size) matrix per axis — resize,
blur(+padding)(+stride), or their exact matrix product — and applies it with
one einsum per axis. Matrices are tiny (≤1280×646 f32) trace-time constants.
float32 inputs use HIGHEST precision (parity path); bf16 uses the default.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax.numpy as jnp
from jax import lax

from ircolor_tpu.ops.filters import binomial_filter_1d
from ircolor_tpu.ops.resize import _align_corners_grid


@lru_cache(maxsize=None)
def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out × in) align-corners bilinear interpolation matrix."""
    lo, hi, w = _align_corners_grid(in_size, out_size)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), lo), 1.0 - w)
    np.add.at(m, (np.arange(out_size), hi), w)
    return m


def _pad_indices(size: int, lo: int, hi: int, pad_type: str) -> np.ndarray | None:
    """Source index per padded position; None marks zero padding rows."""
    idx = np.arange(-lo, size + hi)
    if pad_type == "reflect":
        # numpy/PyTorch reflect (edge not repeated): period 2(size-1)
        period = max(2 * (size - 1), 1)
        idx = np.abs(idx) % period
        idx = np.where(idx >= size, period - idx, idx)
        return idx
    if pad_type == "replicate":
        return np.clip(idx, 0, size - 1)
    if pad_type == "zero":
        return np.where((idx >= 0) & (idx < size), idx, -1)
    raise NotImplementedError(f"pad type [{pad_type}]")


@lru_cache(maxsize=None)
def blur_matrix(
    in_size: int,
    filt_size: int = 3,
    stride: int = 1,
    pad_type: str = "reflect",
    pad_off: int = 0,
) -> np.ndarray:
    """(out × in) matrix: boundary pad + 1-D binomial blur + stride.

    Matches the reference Downsample/UpsampleAA per-axis behavior
    (pad sizes floor/ceil((filt_size-1)/2 + pad_off), ref :283-289).
    """
    a = binomial_filter_1d(filt_size)
    a = (a / a.sum()).astype(np.float64)
    pad = (filt_size - 1) / 2.0
    lo = int(pad + pad_off)
    hi = int(math.ceil(pad + pad_off))
    padded = in_size + lo + hi
    out = (padded - filt_size) // stride + 1
    src = _pad_indices(in_size, lo, hi, pad_type)
    m = np.zeros((out, in_size), np.float64)
    for o in range(out):
        for k in range(filt_size):
            j = src[o * stride + k]
            if j >= 0:
                m[o, j] += a[k]
    return m.astype(np.float32)


@lru_cache(maxsize=None)
def upsample_blur_matrix(in_size: int, filt_size: int = 3, stride: int = 2,
                         pad_type: str = "reflect") -> np.ndarray:
    """(stride·in × in): blur(stride 1) ∘ align-corners ×stride resize."""
    up = resize_matrix(in_size, in_size * stride).astype(np.float64)
    blur = blur_matrix(in_size * stride, filt_size, 1, pad_type).astype(np.float64)
    return (blur @ up).astype(np.float32)


@lru_cache(maxsize=None)
def window_matrix(
    in_size: int, weights: tuple[float, ...], padding: str = "valid"
) -> np.ndarray:
    """(out × in) matrix for a 1-D correlation with ``weights``.

    padding "valid": out = in − K + 1; "same": zero-padded, out = in
    (odd K, matching ``F.conv2d(padding=K//2)``).
    """
    k = len(weights)
    if padding == "valid":
        out, off = in_size - k + 1, 0
    elif padding == "same":
        out, off = in_size, -(k // 2)
    else:
        raise ValueError(padding)
    m = np.zeros((out, in_size), np.float64)
    for o in range(out):
        for i, w in enumerate(weights):
            j = o + off + i
            if 0 <= j < in_size:
                m[o, j] = w
    return m.astype(np.float32)


def _precision_for(x: jnp.ndarray):
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def apply_axis_ops(x: jnp.ndarray, m_h: np.ndarray | None, m_w: np.ndarray | None) -> jnp.ndarray:
    """Apply (out×in) matrices along H (axis 1) and/or W (axis 2) of NHWC."""
    prec = _precision_for(x)
    if m_h is not None:
        x = jnp.einsum("oh,bhwc->bowc", jnp.asarray(m_h, x.dtype), x, precision=prec)
    if m_w is not None:
        x = jnp.einsum("ow,bhwc->bhoc", jnp.asarray(m_w, x.dtype), x, precision=prec)
    return x


def apply_axis_ops_chfirst(
    x: jnp.ndarray, m_h: np.ndarray | None, m_w: np.ndarray | None
) -> jnp.ndarray:
    """Same, for channel-first (B, C, H, W) tensors (the metric layout)."""
    prec = _precision_for(x)
    if m_h is not None:
        x = jnp.einsum("oh,bchw->bcow", jnp.asarray(m_h, x.dtype), x, precision=prec)
    if m_w is not None:
        x = jnp.einsum("ow,bchw->bcho", jnp.asarray(m_w, x.dtype), x, precision=prec)
    return x

"""Bilinear resize with PyTorch ``align_corners=True`` semantics.

Reference semantics: ``F.interpolate(x, scale_factor=2, mode='bilinear',
align_corners=True)`` inside ``UpsampleAA``
(`/root/reference/Code/ir_colorization.py:351-352`) and the decoder's
shape-fixup ``F.interpolate(..., size=..., align_corners=True)``
(ref :555-556, :562-563). ``jax.image.resize(method='linear')`` implements
half-pixel-center sampling, NOT align-corners, so this module implements the
align-corners sample grid explicitly:

    src = dst_idx * (in_size - 1) / (out_size - 1)        (out_size > 1)

Implementation: per-axis 1-D gather + lerp with statically precomputed
index/weight vectors — two cheap gathers per axis, fully fusible by XLA, no
dynamic shapes. Interpolation runs in float32 for parity.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _align_corners_grid(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (lo_idx, hi_idx, hi_weight) for 1-D align-corners sampling."""
    if out_size == 1 or in_size == 1:
        lo = np.zeros((out_size,), dtype=np.int32)
        return lo, lo, np.zeros((out_size,), dtype=np.float32)
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(src).astype(np.int32)
    lo = np.clip(lo, 0, in_size - 2)
    w = (src - lo).astype(np.float32)
    return lo, lo + 1, w


def _interp_axis(x: jnp.ndarray, axis: int, in_size: int, out_size: int) -> jnp.ndarray:
    if in_size == out_size:
        return x
    lo, hi, w = _align_corners_grid(in_size, out_size)
    xlo = jnp.take(x, jnp.asarray(lo), axis=axis)
    xhi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    wj = jnp.asarray(w).reshape(shape)
    return xlo * (1.0 - wj) + xhi * wj


def bilinear_align_corners(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Resize NHWC ``x`` to spatial size ``out_hw`` (align_corners=True).

    MXU-friendly channel counts use per-axis interpolation MATRICES
    (ops.linops) — measured 4–7× faster than gather-lerp on v5e, where
    gathers are lane-hostile. Narrow tensors keep the gather path.
    """
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if x.shape[-1] >= 32:
        from ircolor_tpu.ops.linops import apply_axis_ops, resize_matrix

        m_h = resize_matrix(h, oh) if h != oh else None
        m_w = resize_matrix(w, ow) if w != ow else None
        return apply_axis_ops(x, m_h, m_w)
    dtype = x.dtype
    y = x.astype(jnp.float32)
    y = _interp_axis(y, 1, h, oh)
    y = _interp_axis(y, 2, w, ow)
    return y.astype(dtype)


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """×2 spatial upsample (ref ``scale_factor=2``, :351)."""
    _, h, w, _ = x.shape
    return bilinear_align_corners(x, (2 * h, 2 * w))

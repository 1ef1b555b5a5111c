"""Differentiable SSIM (training loss).

Reference semantics: ``ssim_loss_torch``
(`/root/reference/Code/ir_colorization.py:714-750`) — depthwise 11×11
Gaussian (σ=1.5) convolutions with zero padding ``window_size//2`` (same
spatial size) compute μ, σ², σ₁₂; C1=0.01², C2=0.03²; loss is
``1 − mean(ssim_map)``. Inputs are [0,1] images; here NHWC.

The map is computed with five depthwise convolutions over the same window —
XLA fuses the elementwise tail; a Pallas single-pass fusion is a flagged
optimization (``ircolor_tpu.ops.pallas_kernels``) kept parity-gated.
"""

from __future__ import annotations

import jax.numpy as jnp

from ircolor_tpu.ops.filters import gaussian_window_1d


def ssim_index(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
    precision=None,
) -> jnp.ndarray:
    """Mean SSIM between NHWC [0,1] images (the reference's ssim_val)."""
    assert img1.shape == img2.shape, "SSIM images must have the same shape"
    del precision  # separable shift-and-add; no matmul involved
    g1d = gaussian_window_1d(window_size, 1.5)

    # Channel-first: with C=3 in the lane dim, every elementwise op would run
    # at 3/128 lane utilization; (B,C,H,W) puts the wide W axis in the lanes.
    # The K×K Gaussian window is g⊗g — applied as per-axis zero-padded
    # "same" matmuls (ops.linops), exactly matching the reference's
    # ``F.conv2d(..., padding=K//2, groups=C)`` (ref :727-736).
    img1 = jnp.moveaxis(img1, 3, 1)
    img2 = jnp.moveaxis(img2, 3, 1)
    from ircolor_tpu.ops.linops import apply_axis_ops_chfirst, window_matrix

    _, _, h, w = img1.shape
    m_h = window_matrix(h, tuple(float(v) for v in g1d), "same")
    m_w = window_matrix(w, tuple(float(v) for v in g1d), "same")

    def filt(x):
        return apply_axis_ops_chfirst(x, m_h, m_w)

    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def ssim_loss(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
    precision=None,
) -> jnp.ndarray:
    """``1 − SSIM`` (ref :744-750)."""
    return 1.0 - ssim_index(img1, img2, window_size, size_average, precision)

"""Fixed low-pass filters.

Reference semantics: ``get_filter`` builds a normalized 2-D binomial blur
kernel from Pascal-triangle rows of size 1..7
(`/root/reference/Code/ir_colorization.py:240-266`), used by the blur-pool
anti-aliased down/upsample. ``_gaussian_window`` (ref :699-703) is the 1-D
σ=1.5 window behind the differentiable SSIM loss.

These are host-side constant builders (numpy); the constants are closed over
by jitted functions and live in the compiled executable.
"""

from __future__ import annotations

import numpy as np

_PASCAL_ROWS = {
    1: [1.0],
    2: [1.0, 1.0],
    3: [1.0, 2.0, 1.0],
    4: [1.0, 3.0, 3.0, 1.0],
    5: [1.0, 4.0, 6.0, 4.0, 1.0],
    6: [1.0, 5.0, 10.0, 10.0, 5.0, 1.0],
    7: [1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0],
}


def binomial_filter_1d(filt_size: int = 3) -> np.ndarray:
    """Unnormalized Pascal row of length ``filt_size`` (1..7)."""
    if filt_size not in _PASCAL_ROWS:
        raise ValueError("filt_size must be 1-7")
    return np.asarray(_PASCAL_ROWS[filt_size], dtype=np.float32)


def binomial_filter_2d(filt_size: int = 3) -> np.ndarray:
    """2-D binomial filter normalized to sum 1 (ref :264-265).

    Default size 3 → [1,2,1]⊗[1,2,1]/16.
    """
    a = binomial_filter_1d(filt_size)
    filt = a[:, None] * a[None, :]
    return (filt / filt.sum()).astype(np.float32)


def gaussian_window_1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """1-D Gaussian window normalized to sum 1 (ref :699-703)."""
    coords = np.arange(window_size, dtype=np.float64) - (window_size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def gaussian_window_2d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """K×K separable Gaussian window (outer product, ref :706-711)."""
    g = gaussian_window_1d(window_size, sigma).astype(np.float64)
    g = g / g.sum()
    w = g[:, None] * g[None, :]
    return w.astype(np.float32)

"""Image-quality metrics (MAE / MSE / PSNR / SSIM), device-side and batched.

Reference semantics: ``compute_metrics``
(`/root/reference/Code/ir_colorization.py:1184-1217`) on H×W×3 float [0,1]
images — MAE, MSE, ``PSNR = 20·log10(1.0) − 10·log10(mse + 1e-12)`` with inf
when mse == 0 (ref :1202-1205), and SSIM via scikit-image
(``data_range=1.0, channel_axis=2``, ref :1208-1213).

scikit-image is NOT available in this environment, so ``ssim_skimage``
reimplements ``skimage.metrics.structural_similarity`` defaults exactly:
7×7 UNIFORM filter (not Gaussian), sample covariance (N/(N−1) with N=49),
K1=0.01 / K2=0.03, border crop of (win−1)//2, per-channel mean for
multichannel. The uniform filter + crop pair is computed with VALID
depthwise convolutions (identical to filter-then-crop on the interior).

The uint8 round-trip the reference bakes into its metrics — predictions are
quantized to uint8 before comparison (ref :1413) — is reproduced by
``quantize_to_uint8_01`` (numpy ``astype(uint8)`` truncates, i.e. floor for
non-negative values).

Everything is jit-compatible and batched over the leading axis, so the whole
metric suite runs on-device alongside inference (the reference loops
per-image on host with skimage).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np



def quantize_to_uint8_01(x01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float → uint8-quantized [0,1] float (ref :1389+1413 round trip)."""
    return jnp.floor(jnp.clip(x01, 0.0, 1.0) * 255.0) / 255.0


def ssim_skimage(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """skimage-default SSIM on NHWC batches → per-image (B,) values.

    Matches ``structural_similarity(gt, pred, data_range=1.0,
    channel_axis=2)`` (gaussian_weights=False path).
    """
    assert pred.shape == gt.shape
    # Channel-first layout: with C=3 in the lane dim, every elementwise op
    # would run at 3/128 lane utilization; (B,C,H,W) puts W in the lanes.
    return _ssim_chfirst(
        jnp.moveaxis(pred.astype(jnp.float32), 3, 1),
        jnp.moveaxis(gt.astype(jnp.float32), 3, 1),
        win_size, k1, k2, data_range,
    )


def _ssim_chfirst(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """skimage-default SSIM on (B, C, H, W) float32 batches → (B,)."""
    np_pix = win_size * win_size
    cov_norm = np_pix / (np_pix - 1.0)
    _, _, h, w = pred.shape

    # Uniform K×K window as per-axis (out×in) MXU matmuls (ops.linops) —
    # grouped convs/gathers idle the lanes at C=3.
    from ircolor_tpu.ops.linops import apply_axis_ops_chfirst, window_matrix

    weights = (1.0 / win_size,) * win_size
    m_h = window_matrix(h, weights, "valid")
    m_w = window_matrix(w, weights, "valid")

    def f(x):
        return apply_axis_ops_chfirst(x, m_h, m_w)

    ux, uy = f(pred), f(gt)
    uxx, uyy, uxy = f(pred * pred), f(gt * gt), f(pred * gt)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    # VALID convs already produced exactly the cropped interior; per-channel
    # mean then channel average == mean over (H',W',C).
    return jnp.mean(s, axis=(1, 2, 3))


def batched_metrics(pred01: jnp.ndarray, gt01: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Per-image MAE/MSE/PSNR/SSIM over an NHWC batch (all shapes (B,))."""
    # One transpose to channel-first; all metric math then runs with the
    # wide W axis in the TPU lane dimension (C=3 lanes would idle 125/128).
    p = jnp.moveaxis(pred01.astype(jnp.float32), 3, 1)
    g = jnp.moveaxis(gt01.astype(jnp.float32), 3, 1)
    diff = p - g
    mae = jnp.mean(jnp.abs(diff), axis=(1, 2, 3))
    mse = jnp.mean(diff * diff, axis=(1, 2, 3))
    psnr = jnp.where(
        mse == 0.0,
        jnp.inf,
        -10.0 * jnp.log10(mse + 1e-12),  # 20·log10(1.0) term is zero
    )
    ssim = _ssim_chfirst(p, g)
    return {"mae": mae, "mse": mse, "psnr": psnr, "ssim": ssim}


def compute_metrics(pred_01: np.ndarray, gt_01: np.ndarray) -> tuple[float, float, float, float]:
    """Single-image host API matching the reference signature (ref :1184).

    Returns (mae, mse, psnr, ssim) floats; psnr is ``inf`` when mse == 0.
    """
    diff = pred_01.astype(np.float64) - gt_01.astype(np.float64)
    mae = float(np.mean(np.abs(diff)))
    mse = float(np.mean(diff**2))
    psnr = float("inf") if mse == 0 else 20.0 * math.log10(1.0) - 10.0 * math.log10(mse + 1e-12)
    ssim_val = float(
        jax.jit(ssim_skimage)(
            jnp.asarray(pred_01)[None], jnp.asarray(gt_01)[None]
        )[0]
    )
    return mae, mse, psnr, ssim_val

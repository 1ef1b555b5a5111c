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

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ircolor_tpu.ops.conv import depthwise_conv2d
from ircolor_tpu.ops.filters import binomial_filter_1d, binomial_filter_2d
from ircolor_tpu.ops.padding import pad2d
from ircolor_tpu.ops.resize import bilinear_align_corners
from ircolor_tpu.ops.separable import separable_filter2d

# Measured on v5e (16,512,640,128) bf16, IN FULL-FORWARD CONTEXT
# (tools/fwdvariants.py, round 2): the down path is fastest as an honest
# pad + depthwise blur (-13.9 ms vs the matmul pair over the whole
# generator forward), while the UP path keeps the per-axis MXU matmul
# composition (ops.linops) — it folds the align-corners upsample + pad +
# blur into one matmul pair and switching it to depthwise costs +18.6 ms.
# Isolated-stage numbers ranked these differently; in-context wins rule.
# Small channel counts (the C=3 SSIM paths) use separable shift-and-add.
_MATMUL_MIN_CHANNELS = 32
_SEPARABLE_MAX_CHANNELS = 16


def _norm_1d(filt_size: int) -> np.ndarray:
    """1-D factor of the normalized 2-D binomial filter: (a/Σa)⊗(a/Σa) equals
    the reference's (a⊗a)/Σ(a⊗a) exactly."""
    a = binomial_filter_1d(filt_size)
    return a / a.sum()


def _blur(y: jnp.ndarray, filt_size: int, stride: int, precision) -> jnp.ndarray:
    if y.shape[-1] <= _SEPARABLE_MAX_CHANNELS:
        return separable_filter2d(y, _norm_1d(filt_size), padding="valid", stride=stride)
    return depthwise_conv2d(
        y, binomial_filter_2d(filt_size), stride=stride, padding="VALID",
        precision=precision,
    )


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
    use_matmul: bool = False,
    matmul_bwd: bool = False,
) -> jnp.ndarray:
    """Pad + depthwise binomial blur at stride (ref Downsample.forward :307-310).

    Shipped as the honest pad + depthwise conv: in full-forward context this
    beats the matmul-pair formulation by 13.9 ms at 16×512×640 (see module
    note). ``use_matmul=True`` keeps the matmul path available for A/Bs.

    ``matmul_bwd=True`` keeps the depthwise FORWARD but swaps the autodiff
    backward (a depthwise gradient conv with lhs_dilation=stride over the
    cotangent plus a pad-VJP fold — VPU-bound, measured 8.1/4.1 ms at the
    b8 512×640 down1/down2 planes) for the transposed banded matmuls of the
    matmul form (2.8/1.1 ms, tools/blurgrad.py). Exact: the op is linear,
    so its VJP IS the transposed operator; max|Δgrad| vs autodiff is f32
    rounding (tests/test_ops.py). Kept off by default for spatially-sharded
    training — a banded matmul over a sharded image axis makes GSPMD gather
    the axis instead of halo-exchanging it.
    """
    if use_matmul and x.shape[-1] >= _MATMUL_MIN_CHANNELS:
        from ircolor_tpu.ops.linops import apply_axis_ops, blur_matrix

        _, h, w, _ = x.shape
        m_h = blur_matrix(h, filt_size, stride, pad_type, pad_off)
        m_w = blur_matrix(w, filt_size, stride, pad_type, pad_off)
        return apply_axis_ops(x, m_h, m_w)
    if matmul_bwd:
        return _blur_down_mmbwd(
            x, x.shape[1], x.shape[2], filt_size, stride, pad_type, pad_off,
            precision,
        )
    return _blur_down_primal(x, filt_size, stride, pad_type, pad_off, precision)


def _blur_down_primal(x, filt_size, stride, pad_type, pad_off, precision):
    """The ONE depthwise blur-down forward both VJP choices share."""
    y = pad2d(x, _blur_pad_sizes(filt_size, pad_off), pad_type)
    return _blur(y, filt_size, stride, precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def _blur_down_mmbwd(x, h, w, filt_size, stride, pad_type, pad_off, precision):
    return _blur_down_primal(x, filt_size, stride, pad_type, pad_off, precision)


def _blur_down_mmbwd_fwd(x, h, w, filt_size, stride, pad_type, pad_off, precision):
    out = _blur_down_mmbwd(x, h, w, filt_size, stride, pad_type, pad_off, precision)
    return out, None


def _blur_down_mmbwd_bwd(h, w, filt_size, stride, pad_type, pad_off, precision, res, dy):
    from ircolor_tpu.ops.linops import apply_axis_ops, blur_matrix

    # (in × out) transposes, materialized row-major at trace time.
    mt_h = np.ascontiguousarray(blur_matrix(h, filt_size, stride, pad_type, pad_off).T)
    mt_w = np.ascontiguousarray(blur_matrix(w, filt_size, stride, pad_type, pad_off).T)
    return (apply_axis_ops(dy, mt_h, mt_w).astype(dy.dtype),)


_blur_down_mmbwd.defvjp(_blur_down_mmbwd_fwd, _blur_down_mmbwd_bwd)


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
    if x.shape[-1] >= _MATMUL_MIN_CHANNELS:
        from ircolor_tpu.ops.linops import apply_axis_ops, upsample_blur_matrix

        m_h = upsample_blur_matrix(h, filt_size, stride, pad_type)
        m_w = upsample_blur_matrix(w, filt_size, stride, pad_type)
        return apply_axis_ops(x, m_h, m_w)
    y = bilinear_align_corners(x, (h * stride, w * stride))
    y = pad2d(y, _blur_pad_sizes(filt_size), pad_type)
    return _blur(y, filt_size, 1, precision)

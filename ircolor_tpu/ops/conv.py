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


def conv2d_lanepack(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    p: int,
    *,
    stride: int | tuple[int, int] = 1,
    padding: str | tuple[tuple[int, int], tuple[int, int]] = "SAME",
    bias: jnp.ndarray | None = None,
    precision=None,
) -> jnp.ndarray:
    """Conv with ``p`` horizontally-adjacent output pixels packed into the
    feature dimension — the MXU-lane-utilization transform for small-Cout
    convs.

    The generator's output head (7×7, Cout=3; ref
    `/root/reference/Code/ir_colorization.py:527-531`) and the last decoder
    conv (3×3, Cout=64) use 3/128 and 64/128 of the MXU's lane dimension —
    measured 44 / 60 TF/s vs the 192 TF/s XLA reaches on full-width convs
    (docs/PERF.md round 2). Packing p output pixels as ``p·Cout`` features
    widens the kernel to ``kw+sw·(p−1)`` taps, strides W by ``sw·p``, and
    unpacks the output back; the added taps multiply structural zeros so the
    math is EXACT (floating-point reassociation aside) while lane
    utilization rises p-fold.

    ``stride``: the ORIGINAL conv's stride (H, W) — supports the strided
    PatchGAN 4×4 convs (ref :599-630). ``padding``: "SAME" (zero; odd kw
    only), "VALID" (caller pre-padded, e.g. reflect), or an explicit
    ((top,bottom),(left,right)) tuple. Requires output W divisible by p.
    """
    kh, kw, cin, cout = kernel.shape
    if isinstance(stride, int):
        stride = (stride, stride)
    sh, sw = stride
    if padding == "SAME":
        assert kh % 2 == 1 and kw % 2 == 1 and sh == sw == 1, (
            "SAME lane-packing: odd kh/kw, stride 1"
        )
        pad_h = (kh // 2, kh // 2)
        pad_w = (kw // 2, kw // 2)
    elif padding == "VALID":
        pad_h = pad_w = (0, 0)
    else:
        pad_h, pad_w = padding
    # K2[dy, dx, ci, q·cout+co] = K[dy, dx−q·sw, ci, co] (zero outside).
    k2 = jnp.concatenate(
        [
            jnp.pad(kernel, ((0, 0), (q * sw, sw * (p - 1 - q)), (0, 0), (0, 0)))
            for q in range(p)
        ],
        axis=-1,
    )
    y = lax.conv_general_dilated(
        x, k2, (sh, sw * p), (pad_h, pad_w),
        dimension_numbers=_DIMS, precision=precision,
    )
    b, h, wp, _ = y.shape
    out_w = (x.shape[2] + pad_w[0] + pad_w[1] - kw) // sw + 1
    assert out_w == wp * p, (out_w, wp, p)
    y = y.reshape(b, h, wp, p, cout).reshape(b, h, wp * p, cout)
    if bias is not None:
        y = y + bias
    return y


def conv3x3_reflect(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    precision=None,
) -> jnp.ndarray:
    """3×3 conv with 1-px REFLECT padding, without materializing the pad.

    ``reflect_pad(1) + VALID conv`` (the ResnetBlock pattern, ref
    `/root/reference/Code/ir_colorization.py:380-393`) materializes a padded
    copy of the activation in HBM — measured ~9% of generator forward time
    across the 36 block convs. A zero-SAME conv is free (XLA folds the
    padding into the conv); reflect semantics differ from zero padding only
    in the 1-px output border, which is restored exactly by four thin edge
    convolutions (the kernel row/column applied to the reflected row/column)
    plus four single-pixel corner matmuls:

      top edge    += K[0,:] ⊛ x[1, :]      (row −1 reflects to row 1)
      bottom edge += K[2,:] ⊛ x[H−2, :]
      left edge   += K[:,0] ⊛ x[:, 1]
      right edge  += K[:,2] ⊛ x[:, W−2]
      corners     += the single (r,c)=(−1,−1)-style tap, e.g. K[0,0]·x[1,1]

    Requires H ≥ 3 and W ≥ 3 (same constraint as reflect padding itself for
    meaningful behavior; callers fall back to the materialized pad below).
    """
    _, h, w, _ = x.shape
    assert h >= 3 and w >= 3, "conv3x3_reflect needs H,W >= 3"
    k = kernel
    y = conv2d(x, k, stride=1, padding=((1, 1), (1, 1)), precision=precision)

    # Edge corrections: 1-row / 1-column convs with zero padding along the
    # edge direction (their own missing corner taps are added separately).
    top = conv2d(x[:, 1:2], k[0:1], padding=((0, 0), (1, 1)), precision=precision)
    bot = conv2d(x[:, h - 2 : h - 1], k[2:3], padding=((0, 0), (1, 1)), precision=precision)
    left = conv2d(x[:, :, 1:2], k[:, 0:1], padding=((1, 1), (0, 0)), precision=precision)
    right = conv2d(x[:, :, w - 2 : w - 1], k[:, 2:3], padding=((1, 1), (0, 0)), precision=precision)
    y = y.at[:, 0:1].add(top)
    y = y.at[:, h - 1 : h].add(bot)
    y = y.at[:, :, 0:1].add(left)
    y = y.at[:, :, w - 1 : w].add(right)

    def corner(px, kk):  # px: (B, C), kk: (C, C')
        return jnp.einsum("bc,cd->bd", px, kk, precision=precision)

    y = y.at[:, 0, 0].add(corner(x[:, 1, 1], k[0, 0]))
    y = y.at[:, 0, w - 1].add(corner(x[:, 1, w - 2], k[0, 2]))
    y = y.at[:, h - 1, 0].add(corner(x[:, h - 2, 1], k[2, 0]))
    y = y.at[:, h - 1, w - 1].add(corner(x[:, h - 2, w - 2], k[2, 2]))

    if bias is not None:
        y = y + bias
    return y


def conv_reflect_same(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    p: int = 1,
    bias: jnp.ndarray | None = None,
    precision=None,
) -> jnp.ndarray:
    """K×K (odd, stride 1) conv with REFLECT padding, without materializing
    the (B, H+2n, W+2n, C) padded activation.

    The reference's 7×7 heads are ``ReflectionPad2d(3) + Conv2d`` (ref
    `/root/reference/Code/ir_colorization.py:458-463, 527-531`). The pad
    materialization dominates the outc stage's HBM cost (the round-3
    zero-pads knockout prices inc+outc pads at ~7 ms of the 512×640 b16
    forward, docs/PERF.md) and the 646-wide padded buffer breaks the nice
    640-tiling of the lane-packed conv. Here the bulk runs as a zero-SAME
    conv on the UNPADDED input (lane-packed when ``p > 1`` — XLA folds the
    zero padding into the conv, no copy), and only the n-px output border —
    0.9% of pixels for n=3 at 512×640 — is overwritten with exact values
    from four thin reflect-padded strip convolutions. Exact math (the
    interior is untouched by padding semantics; the border is recomputed
    with true reflect windows).

    Requires H > 2n and W > 2n; callers with smaller images fall back to
    the materialized pad.
    """
    kh, kw, cin, cout = kernel.shape
    assert kh == kw and kh % 2 == 1, "conv_reflect_same: odd square kernels"
    n = kh // 2
    b, h, w, c = x.shape
    assert h > 2 * n and w > 2 * n, "conv_reflect_same needs H, W > kernel-1"
    return _conv_reflect_same_impl(
        x, kernel, n=n, p=p, bias=bias, precision=precision, borders="hw"
    )


def _conv_reflect_same_impl(
    x, kernel, *, n, p, bias, precision, borders
):
    """Implementation with a perf-bisection knob: ``borders`` selects which
    output borders get the exact-reflect overwrite ("hw" = both = correct;
    "h"/"w"/"" are WRONG-math probes for tools/fwdvariants only)."""
    b, h, w, c = x.shape
    # An upstream reverse (e.g. a producer's reflect pad) fusing into this
    # padded conv trips the same TPU fusion-emitter ReverseInput check as the
    # strips below; pin the input as a plain buffer.
    x = jax.lax.optimization_barrier(x)

    if p > 1:
        y = conv2d_lanepack(
            x, kernel, p, padding=((n, n), (n, n)), bias=bias,
            precision=precision,
        )
    else:
        y = conv2d(x, kernel, padding=((n, n), (n, n)), precision=precision)
        if bias is not None:
            y = y + bias

    def add_bias(v):
        return v if bias is None else v + bias

    def strip(v):
        # The reflect overhang is built from negative-stride slices; XLA's
        # TPU fusion emitter CRASHES (fusion_emitter.cc ReverseInput
        # TransformWindow check) when it fuses that reverse into the conv's
        # window. Materialize the tiny strip input behind a barrier so the
        # conv sees a plain buffer.
        return jax.lax.optimization_barrier(v)

    wpad = ((0, 0), (0, 0), (n, n), (0, 0))
    if "h" in borders:
        # Top/bottom strips: rows −n..2n−1 (resp. h−2n..h+n−1) with the H
        # overhang reflected, W reflect-padded, VALID conv ⇒ exact output
        # rows 0..n−1 (resp. h−n..h−1) across the full width (corners
        # included).
        top_in = jnp.concatenate([x[:, n:0:-1], x[:, : 2 * n]], axis=1)
        top = conv2d(strip(jnp.pad(top_in, wpad, mode="reflect")), kernel,
                     padding="VALID", precision=precision)
        bot_in = jnp.concatenate(
            [x[:, h - 2 * n :], x[:, h - 2 : h - n - 2 : -1]], axis=1
        )
        bot = conv2d(strip(jnp.pad(bot_in, wpad, mode="reflect")), kernel,
                     padding="VALID", precision=precision)
        y = y.at[:, :n].set(add_bias(top))
        y = y.at[:, h - n :].set(add_bias(bot))
    if "w" in borders:
        # Left/right strips: cols −n..2n−1 with the W overhang reflected, H
        # VALID ⇒ exact output rows n..h−n−1, cols 0..n−1 (resp. w−n..w−1).
        # Computed in H↔W-TRANSPOSED orientation: the natural form is a
        # 9-wide full-height conv whose tiny W (sublane) extent compiles to
        # a pathological layout on TPU; transposing makes it a short
        # full-width strip like top/bottom (the transposes move ~18 MB).
        kt = jnp.swapaxes(kernel, 0, 1)
        xt = jnp.swapaxes(x, 1, 2)  # (B, W, H, C)
        left_in = jnp.concatenate([xt[:, n:0:-1], xt[:, : 2 * n]], axis=1)
        left = conv2d(strip(left_in), kt, padding="VALID", precision=precision)
        right_in = jnp.concatenate(
            [xt[:, w - 2 * n :], xt[:, w - 2 : w - n - 2 : -1]], axis=1
        )
        right = conv2d(strip(right_in), kt, padding="VALID", precision=precision)
        # (B, n, h−2n, C') → transposed back: exactly rows n..h−n−1.
        y = y.at[:, n : h - n, :n].set(add_bias(jnp.swapaxes(left, 1, 2)))
        y = y.at[:, n : h - n, w - n :].set(add_bias(jnp.swapaxes(right, 1, 2)))
    return y


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

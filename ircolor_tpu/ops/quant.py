"""int8 quantized convolution for the opt-in serving mode.

v5e's MXU multiplies int8×int8→int32 at twice the bf16 rate (394 vs 197
TOPS). This module provides the dequantize-exact int8 formulation the
generator's heavy convs switch to under ``Config.quant_int8``:

* **weights**: per-output-channel symmetric quantization over (kh, kw, ci)
  — ``w ≈ wq · sw[co]`` with ``sw = amax/127``;
* **activations**: per-sample dynamic symmetric quantization — one amax
  reduce per conv input (XLA fuses it with the producer's epilogue), so no
  calibration pass is needed, the range is exact, and each image's result
  is independent of what it is batched with;
* **conv**: ``lax.conv_general_dilated`` on int8 operands accumulating in
  int32 (the MXU int8 path), dequantized as ``y32 · (sx · sw[co])`` in f32
  and cast back to the compute dtype.

Why this is numerically safe here: every quantized site in the generator
(`/root/reference/Code/ir_colorization.py:362-418` resblock convs,
:469-482 down convs, :503-524 decoder skip convs) feeds an instance norm,
and IN exactly absorbs any per-channel rescaling of its input —
``IN(c · x_c) ≡ IN(x_c)`` per channel c (and IN stats are per-sample, so
the per-sample activation scale is absorbed too) — so the scales
``sx[b] · sw[co]``
(and the conv bias, ``IN(x + b) ≡ IN(x)``) are mathematically inert. The
only error the quantized mode introduces is round-to-nearest noise on x
and w, never scale mismatch. The 7×7 heads (inc/outc) stay float: they are
cheap and outc writes the image directly.

This is an inference/serving mode with no reference counterpart; the
parity-budget default stays bf16/f32 (``quant_int8=False``). Round-to-
nearest has zero gradient, so training always forces it off
(train/state.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Smallest representable amax: keeps all-zero (or denormal) tensors from
# producing inf scales; quantizing a tensor this small yields zeros, which
# is the exact answer for the conv anyway.
_AMAX_FLOOR = 1e-12


def quantize_weight_per_channel(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(kh, kw, ci, co) float kernel → (int8 kernel, f32 scale[co]).

    Symmetric per-output-channel: ``w ≈ wq · scale[co]`` with
    ``scale = amax(|w|, axes=(0,1,2)) / 127``.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))
    scale = jnp.maximum(amax, _AMAX_FLOOR) / 127.0
    wq = jnp.clip(jnp.rint(wf / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def quantize_dynamic(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Float NHWC tensor → (int8 tensor, f32 per-sample scale (B,1,1,1)),
    symmetric with the range taken from each sample's own amax (dynamic —
    no calibration data). Per-SAMPLE, not per-batch: each image's quantized
    output is independent of what it is batched with, so results are
    invariant to batch size and to data-parallel sharding."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
    scale = jnp.maximum(amax, _AMAX_FLOOR) / 127.0
    xq = jnp.clip(jnp.rint(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def conv2d_int8(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    stride: int = 1,
    padding="VALID",
    bias: jnp.ndarray | None = None,
    out_dtype=None,
) -> jnp.ndarray:
    """NHWC int8 conv with dequantize-exact scales.

    ``x`` and ``kernel`` are float (any dtype); both are quantized here —
    the weight quantization is a pass over the (tiny) kernel per call and
    constant-folds when the params are closure constants. Output is float
    in ``out_dtype`` (default: ``x.dtype``).
    """
    if out_dtype is None:
        out_dtype = x.dtype
    xq, sx = quantize_dynamic(x)
    wq, sw = quantize_weight_per_channel(kernel)
    dn = lax.conv_dimension_numbers(xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    y32 = lax.conv_general_dilated(
        xq,
        wq,
        (stride, stride),
        padding,
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    y = y32.astype(jnp.float32) * (sx * sw)  # (B,1,1,1)·(co) broadcasts
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def conv2d_int8_fixed(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    clip: float = 6.0,
    stride: int = 1,
    padding="VALID",
    bias: jnp.ndarray | None = None,
    out_dtype=None,
) -> jnp.ndarray:
    """``conv2d_int8`` with a FIXED input scale ``127/clip`` instead of the
    dynamic per-sample amax — for inputs that are chains of IN+ReLU outputs
    (bounded ≈[0, 6σ]; blur-pool / aa-upsample are non-negative averages,
    so the bound survives them). Same scheme as the fused block's conv2 leg
    (ops/pallas_resblock._QCLIP) and the int8 head.

    Why it exists: the dynamic amax is a full reduce over the conv input
    that XLA schedules as a barrier between the producer and the conv —
    measured in-context at the decoder's up2 site it flips a +3.9 ms LOSS
    into a **−20.3 ms win** at 32×512×640 (tools/fwdvariants.py
    int8_qc_u2 vs int8_qcf_u2, round 5). Values above ``clip`` saturate —
    acceptable for ≈6σ-bounded inputs, NOT for arbitrary tensors.
    """
    if out_dtype is None:
        out_dtype = x.dtype
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (127.0 / clip)), -127, 127
    ).astype(jnp.int8)
    wq, sw = quantize_weight_per_channel(kernel)
    dn = lax.conv_dimension_numbers(xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    y32 = lax.conv_general_dilated(
        xq,
        wq,
        (stride, stride),
        padding,
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    y = y32.astype(jnp.float32) * (sw * (clip / 127.0))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)

"""Shared model plumbing: init scheme, norm dispatch, conv defaults.

Reference semantics:

* ``init_weights`` (`/root/reference/Code/ir_colorization.py:168-198`):
  conv/linear kernels ~ N(0, 0.02), biases 0; norm affine weights ~ N(1,0.02)
  (only relevant for batch norm — InstanceNorm2d with PyTorch defaults has no
  affine params).
* ``get_norm_layer`` (ref :154-165): "instance" | "batch" | "none".
* ``use_bias`` rule (ref :452-455, :590-593): conv bias only when the norm is
  instance norm.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn import initializers

from ircolor_tpu.ops.norm import (
    instance_norm,
    instance_norm_cvjp,
    instance_norm_onepass,
)

# Reference init: N(0, 0.02) kernels, zero bias (ref :180-181, :190-191).
kernel_init = initializers.normal(stddev=0.02)
bias_init = initializers.zeros

NORM_TYPES = ("instance", "batch", "none")
INIT_TYPES = ("normal", "xavier", "kaiming", "orthogonal")


def make_kernel_init(init_type: str = "normal", gain: float = 0.02):
    """Kernel initializer matching the reference ``init_weights`` options
    (ref :168-198, torch semantics):

    * normal     → N(0, gain)
    * xavier     → xavier_normal_(gain):  std = gain·√(2/(fan_in+fan_out))
    * kaiming    → kaiming_normal_(a=0, fan_in): std = √(2/fan_in)
    * orthogonal → orthogonal_(gain): orthonormal columns scaled by gain
    """
    if init_type == "normal":
        return initializers.normal(stddev=gain)
    if init_type == "xavier":
        return initializers.variance_scaling(gain * gain, "fan_avg", "normal")
    if init_type == "kaiming":
        return initializers.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return initializers.orthogonal(scale=gain, column_axis=-1)
    raise NotImplementedError(
        f"initialization method [{init_type}] is not implemented"
    )


def reinit_params(params, rng: jax.Array, init_type: str, gain: float = 0.02):
    """Re-apply the reference init scheme to an existing param tree — the
    TPU-native equivalent of ``init_net``'s post-construction ``init_weights``
    pass (ref :201-209): conv/linear kernels re-sampled per ``init_type``,
    biases zeroed, norm scales ~ N(1, gain)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, max(len(flat), 1))
    init = make_kernel_init(init_type, gain)
    out = []
    for (kp, leaf), key in zip(flat, keys):
        name = str(kp[-1].key) if hasattr(kp[-1], "key") else ""
        if name == "kernel" and leaf.ndim >= 2:
            out.append(init(key, leaf.shape, leaf.dtype))
        elif name == "bias":
            out.append(jnp.zeros_like(leaf))
        elif name == "scale":  # batch-norm affine weight (ref :193-194)
            out.append(1.0 + gain * jax.random.normal(key, leaf.shape, leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def _scale_around_one(key, shape, dtype=jnp.float32):
    """Affine norm scale ~ N(1, 0.02) (ref :193-194)."""
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


def use_bias_for_norm(norm: str) -> bool:
    """Conv bias iff instance norm (ref :452-455)."""
    if norm not in NORM_TYPES:
        raise NotImplementedError(f"Normalization type [{norm}] not supported")
    return norm == "instance"


class Norm(nn.Module):
    """Dispatching norm layer: instance (param-free) / batch / none."""

    norm: str = "instance"
    # Closed-form analytic IN backward (ops/norm.py:instance_norm_cvjp)
    # instead of autodiff through the stats chain. Same primal; exactness
    # tested. A/B knob (trainbench in_vjp / gradbench _invjp suffix).
    closed_vjp: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.norm == "instance":
            # bf16 compute path: single-pass E[x²]−μ² statistics save one
            # full-tensor HBM read per norm (−6.0 ms over the 512×640 b16
            # forward, tools/fwdvariants.py best vs best_in1p); the
            # difference vs two-pass stats is far below bf16 quantization.
            # f32 (the parity/validation path) keeps two-pass stats.
            if x.dtype == jnp.bfloat16:
                # closed_vjp swaps ONLY the backward: instance_norm_cvjp's
                # primal is the same one-pass form the bf16 path ships. The
                # f32 parity path keeps two-pass stats AND autodiff, so the
                # knob cannot silently change f32 primal numerics.
                if self.closed_vjp:
                    return instance_norm_cvjp(x)
                return instance_norm_onepass(x)
            return instance_norm(x)
        if self.norm == "none" or self.norm is None:
            return x
        if self.norm == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch BatchNorm2d momentum=0.1 ⇔ flax 0.9
                epsilon=1e-5,
                scale_init=_scale_around_one,
                name="bn",
            )(x)
        raise NotImplementedError(f"Normalization type [{self.norm}] not supported")


class Conv(nn.Conv):
    """``flax.linen.Conv`` with the reference init scheme as defaults."""

    kernel_init: Any = kernel_init
    bias_init: Any = bias_init


def lanepack_p(cout: int, out_w: int, max_p: int = 32) -> int:
    """Largest power-of-2 pixel-packing factor that fills MXU lanes
    (p·cout ≤ 128) and divides the output width. 1 = don't pack."""
    p = 1
    while p < max_p and 2 * p * cout <= 128 and out_w % (2 * p) == 0:
        p *= 2
    return p


class QuantConv(nn.Module):
    """``Conv``-identical params (kernel/bias, same names/inits — checkpoints
    interchangeable), computed on the MXU's 2× int8 path
    (``ops.quant.conv2d_int8``): per-channel int8 weights, dynamic per-sample
    int8 activations, int32 accumulation, f32 dequant. Opt-in serving mode —
    see ops/quant.py for why the scales are exactly absorbed by the instance
    norms every quantized site feeds."""

    features: int
    ksize: int = 3
    stride: int = 1
    padding: Any = "VALID"
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ircolor_tpu.ops.quant import conv2d_int8

        k = self.ksize
        kernel = self.param("kernel", kernel_init, (k, k, x.shape[-1], self.features))
        bias = self.param("bias", bias_init, (self.features,)) if self.use_bias else None
        return conv2d_int8(
            x, kernel, stride=self.stride, padding=self.padding,
            bias=bias, out_dtype=self.dtype,
        )


class ConcatConv3x3(nn.Module):
    """3×3 SAME(zero) conv over the concat of two tensors, WITHOUT
    materializing the concat: conv(concat(a, b), K) ≡ conv(a, K[..., :Ca, :])
    + conv(b, K[..., Ca:, :]). Measured 18% faster than concat→conv on v5e
    at the decoder shapes (XLA does not fuse the concatenate away).
    Small-Cout instances (up2: 64 = half the MXU lane width) can additionally
    lane-pack 2 output pixels per feature column — 15.9 → 7.9 ms for the
    isolated conv at 16×512×640 — but in FULL-FORWARD context the packing's
    unpack reshape poisons the consumer's layout and costs +6.2 ms net
    (tools/fwdvariants.py), so ``max_p`` defaults to 1 (off).

    Param layout matches a single Conv over the concatenated input (kernel
    (3, 3, Ca+Cb, features)), so checkpoints are interchangeable with the
    reference's ``up{1,2}_conv`` weights.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    precision: Any = None
    max_p: int = 1
    # int8 serving mode: each half runs on the MXU int8 path with its own
    # per-sample activation scale (the split identity holds per term).
    quant_int8: bool = False
    # FIXED-scale int8 (127/6σ, no amax reduce — ops/quant.py
    # conv2d_int8_fixed): only valid when both inputs are IN+ReLU-derived
    # non-negative ≈6σ-bounded chains (the decoder's up2 site). Measured
    # −20.3 ms in-context at 32×512×640 where the dynamic form LOSES 3.9
    # (tools/fwdvariants.py round 5). Takes precedence over quant_int8.
    quant_fixed: bool = False

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        from ircolor_tpu.ops.conv import conv2d, conv2d_lanepack

        ca, cb = a.shape[-1], b.shape[-1]
        if self.quant_fixed:
            from ircolor_tpu.ops.quant import conv2d_int8_fixed

            kernel = self.param(
                "kernel", kernel_init, (3, 3, ca + cb, self.features)
            )
            y = conv2d_int8_fixed(
                a, kernel[:, :, :ca], padding=((1, 1), (1, 1)),
                out_dtype=jnp.float32,
            ) + conv2d_int8_fixed(
                b, kernel[:, :, ca:], padding=((1, 1), (1, 1)),
                out_dtype=jnp.float32,
            )
            if self.use_bias:
                y = y + self.param("bias", bias_init, (self.features,))
            return y.astype(self.dtype)
        if self.quant_int8:
            from ircolor_tpu.ops.quant import conv2d_int8

            kernel = self.param(
                "kernel", kernel_init, (3, 3, ca + cb, self.features)
            )
            y = conv2d_int8(
                a, kernel[:, :, :ca], padding=((1, 1), (1, 1)),
                out_dtype=jnp.float32,
            ) + conv2d_int8(
                b, kernel[:, :, ca:], padding=((1, 1), (1, 1)),
                out_dtype=jnp.float32,
            )
            if self.use_bias:
                y = y + self.param("bias", bias_init, (self.features,))
            return y.astype(self.dtype)
        kernel = self.param("kernel", kernel_init, (3, 3, ca + cb, self.features))
        kernel = kernel.astype(self.dtype)
        p = lanepack_p(self.features, a.shape[2], max_p=self.max_p)
        if p > 1:
            y = conv2d_lanepack(
                a.astype(self.dtype), kernel[:, :, :ca], p, precision=self.precision
            ) + conv2d_lanepack(
                b.astype(self.dtype), kernel[:, :, ca:], p, precision=self.precision
            )
        else:
            y = conv2d(
                a.astype(self.dtype), kernel[:, :, :ca],
                padding=((1, 1), (1, 1)), precision=self.precision,
            ) + conv2d(
                b.astype(self.dtype), kernel[:, :, ca:],
                padding=((1, 1), (1, 1)), precision=self.precision,
            )
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class LanePackConv(nn.Module):
    """K×K conv computed lane-packed when the output-channel count
    underfills the MXU's 128-wide lane dimension
    (``ops.conv.conv2d_lanepack``). Param layout matches ``Conv``
    (kernel/bias), so checkpoints are interchangeable; math is exact.

    The ONE lane-pack module: the generator's pre-padded VALID heads
    (defaults), the VGG tower's SAME convs, and the PatchGAN's strided
    pad-1 convs are all instances (``padding``/``stride``/``kernel_init``
    fields) — packing semantics and param handling live in one place.

    ``max_p`` caps the auto-chosen packing factor: the outc head (Cout=3,
    p=32) wins 16.3 ms in full-forward context, but packing the inc conv
    (Cout=64, p=2) LOSES 8.1 ms in context despite winning isolated —
    callers set ``max_p=1`` for such sites (tools/fwdvariants.py
    measurements). ``p`` pins the factor explicitly (1 = plain conv).
    """

    features: int
    ksize: int = 7
    stride: int = 1
    padding: Any = "VALID"  # "VALID" | "SAME" | ((ph, ph), (pw, pw))
    use_bias: bool = True
    dtype: Any = jnp.float32
    precision: Any = None
    max_p: int = 32
    p: int | None = None
    kernel_init: Any = kernel_init
    bias_init: Any = bias_init

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ircolor_tpu.ops.conv import conv2d, conv2d_lanepack

        k = self.ksize
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, x.shape[-1], self.features)
        ).astype(self.dtype)
        bias = (
            self.param("bias", self.bias_init, (self.features,)).astype(self.dtype)
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        if self.p is not None:
            p = self.p
        else:
            if self.padding == "VALID":
                pw = 0
            elif self.padding == "SAME":
                pw = k - 1
            else:
                pw = sum(self.padding[1])
            out_w = (x.shape[2] + pw - k) // self.stride + 1
            p = lanepack_p(self.features, out_w, max_p=self.max_p)
        if p > 1:
            return conv2d_lanepack(
                x, kernel, p, stride=self.stride, padding=self.padding,
                bias=bias, precision=self.precision,
            )
        y = conv2d(
            x, kernel, stride=self.stride, padding=self.padding,
            precision=self.precision,
        )
        return y if bias is None else y + bias


class ReflectConv3x3(nn.Module):
    """3×3 conv with 1-px reflect padding via border-corrected zero-SAME conv
    (ops.conv.conv3x3_reflect) — avoids materializing the padded activation.

    Param tree layout matches ``Conv`` (kernel/bias) so checkpoints are
    interchangeable with the pad-then-conv formulation.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ircolor_tpu.ops.conv import conv3x3_reflect

        c = x.shape[-1]
        kernel = self.param("kernel", kernel_init, (3, 3, c, self.features))
        bias = (
            self.param("bias", bias_init, (self.features,)) if self.use_bias else None
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if bias is not None:
            bias = bias.astype(self.dtype)
        return conv3x3_reflect(x, kernel, bias, self.precision)

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

from ircolor_tpu.ops.norm import instance_norm

# Reference init: N(0, 0.02) kernels, zero bias (ref :180-181, :190-191).
kernel_init = initializers.normal(stddev=0.02)
bias_init = initializers.zeros

NORM_TYPES = ("instance", "batch", "none")


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

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.norm == "instance":
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


class ConcatConv3x3(nn.Module):
    """3×3 SAME(zero) conv over the concat of two tensors, WITHOUT
    materializing the concat: conv(concat(a, b), K) ≡ conv(a, K[..., :Ca, :])
    + conv(b, K[..., Ca:, :]). Measured 18% faster than concat→conv on v5e
    at the decoder shapes (XLA does not fuse the concatenate away).

    Param layout matches a single Conv over the concatenated input (kernel
    (3, 3, Ca+Cb, features)), so checkpoints are interchangeable with the
    reference's ``up{1,2}_conv`` weights.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        from ircolor_tpu.ops.conv import conv2d

        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param("kernel", kernel_init, (3, 3, ca + cb, self.features))
        kernel = kernel.astype(self.dtype)
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

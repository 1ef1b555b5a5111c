"""Instance normalization (NHWC).

Reference semantics: ``nn.InstanceNorm2d(C)`` with PyTorch defaults —
``affine=False``, ``track_running_stats=False``, ``eps=1e-5`` — used
throughout generator and discriminator
(`/root/reference/Code/ir_colorization.py:154-165, 461, 471, 479, 503-507,
520-524, 613, 623`). With those defaults there are **no learnable
parameters**: each (sample, channel) is normalized by its own spatial
mean/variance (biased estimator), every forward pass, train and eval alike.

TPU notes: the mean/var reduction + normalize is a classic fusion target;
XLA fuses it into the surrounding conv epilogue well in practice. Statistics
are accumulated in float32 even under a bf16 compute path to keep variance
catastrophic-cancellation-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel spatial normalization of an NHWC tensor."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    # Biased variance, matching torch's normalization statistics.
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def instance_norm_onepass(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Instance norm with single-pass statistics (E[x²] − μ², f32 accum).

    The two-pass form's centered-square reduction depends on the mean, so
    XLA runs two sequential read passes over the tensor just for stats; the
    moment form fuses both into ONE reduction pass — one less full-tensor
    HBM read per norm. Numerics: f32 accumulation over ≤10⁶-element spatial
    planes with O(1) activations keeps |var_onepass − var_twopass| ≲ 1e-6 —
    inside the bf16 quantization the compute path already accepts. Two-pass
    stays the default for the f32 parity path. Moment math lives in ONE
    place (instance_norm_stats) so the XLA norm and the stats the Pallas
    kernels consume cannot desynchronize.
    """
    mean, inv = instance_norm_stats(x, eps)
    y = (x.astype(jnp.float32) - mean[:, None, None, :]) * inv[:, None, None, :]
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm_cvjp(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """One-pass instance norm with a CLOSED-FORM backward.

    Primal math is identical to ``instance_norm_onepass``. The backward is
    the analytic result for biased-variance normalization,

        dx = r · (dy − mean_s(dy) − ŷ · mean_s(dy ⊙ ŷ)),    ŷ = (x − μ)·r,

    (means over the spatial axes per (batch, channel)): two fused spatial
    reductions over (dy, x) plus one elementwise pass, instead of whatever
    chain autodiff traces through mean/square/rsqrt. Exactness vs the
    autodiff backward is tested in f32 (tests/test_ops.py); on the bf16
    path both round through the same f32 compute. A/B knob only — see
    docs/PERF.md for the in-context verdict.
    """
    return instance_norm_onepass(x, eps)


def _in_cvjp_fwd(x, eps):
    mean, inv = instance_norm_stats(x, eps)
    y = (x.astype(jnp.float32) - mean[:, None, None, :]) * inv[:, None, None, :]
    return y.astype(x.dtype), (x, mean, inv)


def _in_cvjp_bwd(eps, res, dy):
    x, mean, inv = res
    dy32 = dy.astype(jnp.float32)
    yhat = (x.astype(jnp.float32) - mean[:, None, None, :]) * inv[:, None, None, :]
    m_dy = jnp.mean(dy32, axis=(1, 2), keepdims=True)
    m_dyy = jnp.mean(dy32 * yhat, axis=(1, 2), keepdims=True)
    dx = inv[:, None, None, :] * (dy32 - m_dy - yhat * m_dyy)
    return (dx.astype(x.dtype),)


instance_norm_cvjp.defvjp(_in_cvjp_fwd, _in_cvjp_bwd)


def instance_norm_stats(
    x: jnp.ndarray, eps: float = 1e-5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(batch, channel) IN statistics as flat (B, C) f32 ``(mean,
    inv_std)`` — the form the normalize-on-load Pallas kernels consume
    (ops.pallas_resblock / ops.pallas_blur). Single-pass moments (see
    instance_norm_onepass for the numerics argument)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2))
    meansq = jnp.mean(jnp.square(x32), axis=(1, 2))
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    return mean, lax.rsqrt(var + eps)

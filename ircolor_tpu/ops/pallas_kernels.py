"""Pallas TPU kernels for bandwidth-bound hot ops.

The generator's FLOPs live in convs (XLA/MXU territory), but instance norm
is pure memory traffic: XLA lowers it as reduce(read) + normalize(read,
write) — ≥3 HBM passes over big activations. ``fused_instance_norm`` does
mean/var/normalize (+ optional ReLU and residual add, covering both halves
of a ResnetBlock: conv→IN→ReLU and conv→IN(+x)) in ONE VMEM-resident pass:
grid over (batch, channel-blocks), each program owning a full (H, W, Cblk)
spatial plane, statistics in float32.

Applicability is shape-gated: the plane must fit VMEM (≈5 MB at the
bottleneck resolution 128×160×128ch bf16 — where 18 of the generator's IN
layers live). Larger planes (encoder/decoder full-res tensors) fall back to
the XLA implementation in ``ircolor_tpu.ops.norm``. The public entry
``instance_norm_auto`` picks per shape; parity with the XLA path is tested
in ``tests/test_pallas.py`` (interpret mode on CPU, compiled on TPU).

Backward: ``fused_instance_norm`` carries a custom VJP whose backward is
plain-XLA math (dx = (g − mean(g) − x̂·mean(g·x̂))/σ, recomputing x̂ from the
saved input) — training correctness does not depend on Mosaic autodiff.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; guard anyway for safety
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

# Pallas double-buffers every in/out block (2 buffers each), so a kernel
# with I inputs + O outputs needs 2·(I+O) block-sized VMEM buffers. The v5e
# default scoped-vmem limit is 16 MB but the hardware admits more; kernels
# request a raised cap (verified on-chip) and budget slightly below it.
_VMEM_LIMIT_BYTES = 32 * 1024 * 1024
_VMEM_BUDGET_BYTES = 30 * 1024 * 1024
_EPS = 1e-5


def _pick_cb(shape: tuple[int, ...], dtype: Any, with_residual: bool) -> int | None:
    """Channel-block size whose double-buffered planes fit the VMEM budget.

    Mosaic requires the block's last dim to be a multiple of 128 OR equal to
    the full channel dim, so the only legal choices are cb=128 (when C%128
    == 0) or cb=C.
    """
    if len(shape) != 4:
        return None
    _, h, w, c = shape
    # Scoped-vmem accounting (verified against Mosaic OOM reports on v5e):
    # double-buffered blocks (2 per array) PLUS the kernel's float32 stack
    # temporaries (x.astype(f32), centered, normalized ≈ 3 f32 planes = 6×
    # a bf16 plane). Budget factor ~12 plane-equivalents (16 with residual).
    n_planes = 16 if with_residual else 12
    candidates = []
    if c % 128 == 0:
        candidates.append(128)
    candidates.append(c)
    for cb in candidates:
        if n_planes * _plane_bytes(h, w, cb, dtype) <= _VMEM_BUDGET_BYTES:
            return cb
    return None


def _in_kernel(x_ref, o_ref, *, relu: bool):
    x = x_ref[...].astype(jnp.float32)            # (1, H, W, CB)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=(1, 2), keepdims=True)
    y = centered * jax.lax.rsqrt(var + _EPS)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[...] = y.astype(o_ref.dtype)


def _in_res_kernel(x_ref, r_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=(1, 2), keepdims=True)
    y = centered * jax.lax.rsqrt(var + _EPS)
    o_ref[...] = (y + r_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _plane_bytes(h: int, w: int, cb: int, dtype) -> int:
    return h * w * cb * jnp.dtype(dtype).itemsize


def pallas_fits(shape: tuple[int, ...], dtype: Any, with_residual: bool = False) -> bool:
    """True when a channel-blocked plane fits the (double-buffered) budget."""
    return _pick_cb(shape, dtype, with_residual) is not None


def _block_spec(h: int, w: int, cb: int, interpret: bool):
    return pl.BlockSpec(
        (1, h, w, cb),
        lambda i, j: (i, 0, 0, j),
        memory_space=pltpu.VMEM if _HAVE_PLTPU and not interpret else None,
    )


def _compiler_params(interpret: bool):
    if interpret or not _HAVE_PLTPU:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _run_in(x: jnp.ndarray, relu: bool, interpret: bool) -> jnp.ndarray:
    b, h, w, c = x.shape
    cb = _pick_cb(x.shape, x.dtype, False)
    assert cb is not None, f"shape {x.shape} does not fit the Pallas IN kernel"
    spec = _block_spec(h, w, cb, interpret)
    return pl.pallas_call(
        functools.partial(_in_kernel, relu=relu),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, c // cb),
        in_specs=[spec],
        out_specs=spec,
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(x)


def _run_in_res(x: jnp.ndarray, residual: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    b, h, w, c = x.shape
    cb = _pick_cb(x.shape, x.dtype, True)
    assert cb is not None, f"shape {x.shape} does not fit the Pallas IN kernel"
    spec = _block_spec(h, w, cb, interpret)
    return pl.pallas_call(
        _in_res_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, c // cb),
        in_specs=[spec, spec],
        out_specs=spec,
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(x, residual)


# ---------------- custom VJP wrappers ----------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_instance_norm(x: jnp.ndarray, relu: bool = False, interpret: bool = False):
    """Single-pass IN (+ReLU). Shapes must satisfy ``pallas_fits``."""
    return _run_in(x, relu, interpret)


def _fin_fwd(x, relu, interpret):
    y = _run_in(x, relu, interpret)
    return y, x


def _fin_bwd(relu, interpret, x, g):
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    centered = x32 - mean
    var = jnp.mean(centered * centered, axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    xhat = centered * inv
    if relu:
        g32 = jnp.where(xhat > 0, g32, 0.0)
    gm = jnp.mean(g32, axis=(1, 2), keepdims=True)
    gx = jnp.mean(g32 * xhat, axis=(1, 2), keepdims=True)
    dx = (g32 - gm - xhat * gx) * inv
    return (dx.astype(x.dtype),)


fused_instance_norm.defvjp(_fin_fwd, _fin_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_instance_norm_residual(x: jnp.ndarray, residual: jnp.ndarray, interpret: bool = False):
    """Single-pass ``residual + IN(x)`` (a ResnetBlock's second half)."""
    return _run_in_res(x, residual, interpret)


def _finr_fwd(x, residual, interpret):
    return _run_in_res(x, residual, interpret), x


def _finr_bwd(interpret, x, g):
    (dx,) = _fin_bwd(False, interpret, x, g)
    return dx, g


fused_instance_norm_residual.defvjp(_finr_fwd, _finr_bwd)


def instance_norm_auto(
    x: jnp.ndarray,
    *,
    relu: bool = False,
    residual: jnp.ndarray | None = None,
    use_pallas: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pick the fused Pallas kernel when the shape fits, else XLA ops."""
    from ircolor_tpu.ops.norm import instance_norm

    if use_pallas and pallas_fits(x.shape, x.dtype, residual is not None):
        if residual is not None:
            return fused_instance_norm_residual(x, residual, interpret)
        return fused_instance_norm(x, relu, interpret)
    y = instance_norm(x)
    if relu:
        y = jax.nn.relu(y)
    if residual is not None:
        y = y + residual
    return y

"""Pallas fused ResNet-block conv kernels (inference fast path).

Building on ``pallas_conv`` (implicit-GEMM 3×3 at 98% of XLA's conv), these
variants delete instance norm's HBM passes inside the bottleneck blocks
(ref ResnetBlock, `/root/reference/Code/ir_colorization.py:362-418`):

* ``conv3x3_stats``  — the conv additionally emits per-(batch, channel)
  spatial sum and sum-of-squares of its raw output, accumulated for free in
  the kernel epilogue (a revisited (1, 2, C) output block). IN statistics
  then cost ZERO extra HBM traffic.
* ``conv3x3_norm_in`` — the conv normalizes its INPUT tiles on load with
  given per-(batch, channel) (mean, inv_std) and applies ReLU before the
  nine matmul taps, so the previous conv's IN+ReLU never touches HBM.
  Reflect padding commutes with per-channel normalization, so the caller
  pads the RAW previous output and passes the stats.

A ResnetBlock (conv→IN→ReLU→conv→IN, +residual) becomes:

    raw1, s1 = conv3x3_stats(pad(x))                   # IN₁ stats free
    raw2, s2 = conv3x3_norm_in_stats(pad(raw1), s1)    # IN₁ applied on load
    out = x + (raw2 − mean₂) · inv₂                    # cheap XLA elementwise

eliminating IN₁'s reduce+normalize passes and IN₂'s reduce pass.

Status: correctness-tested (interpret mode); TPU benchmark in docs/PERF.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

_EPS = 1e-5


def _taps(window_fn, k_ref, th: int, w: int, cout: int):
    acc = jnp.zeros((th, w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + jax.lax.dot_general(
                window_fn(dy, dx),
                k_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _kernel_stats(x_hbm, k_ref, o_ref, s_ref, x_vmem, sem, *, th, w, norm_in: bool,
                  m_ref=None, i_ref=None):
    """Shared body: optional input normalization, conv taps, stats epilogue.

    When ``norm_in`` the positional layout is (x, k, mean, inv) inputs —
    handled by the wrappers below via m_ref/i_ref.
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(h * th, th + 2)], x_vmem, sem)
    dma.start()
    dma.wait()

    if norm_in:
        mean = m_ref[b]  # (C,) — stats arrays are passed whole (B, C)
        inv = i_ref[b]
        xin = x_vmem[...].astype(jnp.float32)
        xin = jnp.maximum((xin - mean[None, None, :]) * inv[None, None, :], 0.0)
        xin = xin.astype(x_vmem.dtype)

        def window(dy, dx):
            return jax.lax.slice(xin, (dy, dx, 0), (dy + th, dx + w, xin.shape[2]))
    else:

        def window(dy, dx):
            return x_vmem[dy : dy + th, dx : dx + w, :]

    cout = o_ref.shape[-1]
    acc = _taps(window, k_ref, th, w, cout)
    o_ref[...] = acc.astype(o_ref.dtype)[None]

    # Stats epilogue: accumulate Σy and Σy² per channel across H-tiles.
    tile_sum = jnp.sum(acc, axis=(0, 1))          # (Cout,) f32
    tile_sq = jnp.sum(acc * acc, axis=(0, 1))
    tile = jnp.stack([tile_sum, tile_sq])[None]   # (1, 2, Cout)

    @pl.when(h == 0)
    def _():
        s_ref[...] = tile

    @pl.when(h != 0)
    def _():
        s_ref[...] = s_ref[...] + tile


def _run(x_padded, kernel, mean=None, inv=None, *, tile_h=16, interpret=False):
    b, hp, wp, c = x_padded.shape
    h, w = hp - 2, wp - 2
    cout = kernel.shape[-1]
    assert h % tile_h == 0, f"H={h} must divide tile_h={tile_h}"
    if wp % 8 != 0:
        x_padded = jnp.pad(x_padded, ((0, 0), (0, 0), (0, 8 - wp % 8), (0, 0)))
        wp = x_padded.shape[2]

    vmem = pltpu.VMEM if (_HAVE_PLTPU and not interpret) else None
    anym = pltpu.ANY if (_HAVE_PLTPU and not interpret) else None
    norm_in = mean is not None

    in_specs = [pl.BlockSpec(memory_space=anym), pl.BlockSpec(memory_space=vmem)]
    operands = [x_padded, kernel]
    if norm_in:
        # Whole (B, C) arrays in VMEM ((1, C) blocks violate the 8-sublane
        # tiling rule); the kernel indexes its batch row.
        stat_spec = pl.BlockSpec(memory_space=vmem)
        in_specs += [stat_spec, stat_spec]
        operands += [mean, inv]

    def body(*refs):
        if norm_in:
            x_hbm, k_ref, m_ref, i_ref, o_ref, s_ref, x_vmem, sem = refs
        else:
            x_hbm, k_ref, o_ref, s_ref, x_vmem, sem = refs
            m_ref = i_ref = None
        _kernel_stats(
            x_hbm, k_ref, o_ref, s_ref, x_vmem, sem,
            th=tile_h, w=w, norm_in=norm_in, m_ref=m_ref, i_ref=i_ref,
        )

    out, stats = pl.pallas_call(
        body,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, cout), x_padded.dtype),
            jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
        ),
        grid=(b, h // tile_h),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, tile_h, w, cout), lambda i, j: (i, j, 0, 0), memory_space=vmem),
            pl.BlockSpec((1, 2, cout), lambda i, j: (i, 0, 0), memory_space=vmem),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, wp, c), x_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*operands)
    n = h * w
    mean_out = stats[:, 0] / n
    var = stats[:, 1] / n - mean_out * mean_out
    inv_out = jax.lax.rsqrt(var + _EPS)
    return out, mean_out, inv_out


def conv3x3_stats(x_padded, kernel, *, tile_h=16, interpret=False):
    """VALID conv of pre-padded input → (raw_out, mean, inv_std) per (B,C)."""
    return _run(x_padded, kernel, tile_h=tile_h, interpret=interpret)


def conv3x3_norm_in_stats(x_padded_raw, kernel, mean, inv, *, tile_h=16, interpret=False):
    """Normalize+ReLU the (pre-padded RAW) input on load, conv, emit stats."""
    return _run(x_padded_raw, kernel, mean, inv, tile_h=tile_h, interpret=interpret)

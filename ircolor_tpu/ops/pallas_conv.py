"""Pallas implicit-GEMM 3×3 convolution (bottleneck-shape experiment).

The generator's FLOPs concentrate in the 18 ResNet-block 3×3 convs at the
bottleneck resolution (SURVEY.md §3.3; knockout-measured ~30% of forward).
XLA's conv achieves ~70 TF/s there (v5e bf16, batch 8–16) vs 114–125 TF/s at
larger shapes — this kernel probes whether an implicit-GEMM formulation with
hand-placed VMEM residency closes the gap (and is the groundwork for a fused
conv+IN+ReLU block kernel).

Shape contract: x is the ALREADY PADDED input (B, H+2, W+2, C) (the caller
keeps the reference's reflect-pad semantics, ref
`/root/reference/Code/ir_colorization.py:380-393`); output is (B, H, W, Cout)
= VALID conv. The kernel tiles H; each program DMAs its (TH+2, W+2, C) halo
window from HBM into VMEM (halos overlap, which BlockSpecs cannot express —
hence the manual copy), keeps the full (3,3,C,Cout) kernel in VMEM, and
accumulates the nine shifted (TH·W, C)×(C, Cout) matmuls in float32.

Status: correctness-tested (interpret mode on CPU, compiled on TPU);
performance relative to XLA's conv is recorded in docs/PERF.md. Not wired
into the models — parity-gated experimentation per SURVEY.md §7.1 step 9.
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


def _compute_taps(x_vmem_slot, k_ref, o_ref, th: int, w: int):
    cout = o_ref.shape[-1]
    acc = jnp.zeros((th, w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            window = x_vmem_slot[dy : dy + th, dx : dx + w, :]
            tap = k_ref[dy, dx]  # (C, Cout)
            acc = acc + jax.lax.dot_general(
                window,
                tap,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[...] = acc.astype(o_ref.dtype)[None]


def _conv_kernel(x_hbm, k_ref, o_ref, x_vmem, sem, *, th: int, w: int):
    b = pl.program_id(0)
    h = pl.program_id(1)

    # Halo window (TH+2, Wp, C): overlapping reads need a manual DMA.
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(h * th, th + 2)], x_vmem, sem)
    dma.start()
    dma.wait()
    _compute_taps(x_vmem, k_ref, o_ref, th, w)


def _conv_kernel_db(x_hbm, k_ref, o_ref, x_vmem, sems, *, th: int, w: int, nh: int):
    """Double-buffered variant: step i starts step i+1's halo DMA before
    computing, so the (small) DMA hides under the 9 matmuls."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    lin = b * nh + h
    total = pl.num_programs(0) * nh
    slot = jax.lax.rem(lin, 2)
    nslot = jax.lax.rem(lin + 1, 2)

    def dma_for(linear, slot_idx):
        bb = jax.lax.div(linear, nh)
        hh = jax.lax.rem(linear, nh)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(hh * th, th + 2)],
            x_vmem.at[slot_idx],
            sems.at[slot_idx],
        )

    @pl.when(lin == 0)
    def _():
        dma_for(lin, slot).start()

    @pl.when(lin + 1 < total)
    def _():
        dma_for(lin + 1, nslot).start()

    dma_for(lin, slot).wait()
    _compute_taps(x_vmem.at[slot], k_ref, o_ref, th, w)


def _compute_taps_preshift(x_vmem_slot, k_ref, o_ref, xs, th: int, w: int):
    """Aligned-taps variant: copy the three dx-shifted windows into aligned
    scratch ONCE, so all nine matmul operands are tile-aligned (the naive
    form's dx∈{1,2} window slices are sublane-misaligned — Mosaic relayouts
    the whole window per tap, 6 hidden copies per tile; this does 3)."""
    cout = o_ref.shape[-1]
    for dx in range(3):
        xs[dx] = x_vmem_slot[:, dx : dx + w, :]
    acc = jnp.zeros((th, w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + jax.lax.dot_general(
                xs[dx, dy : dy + th],
                k_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[...] = acc.astype(o_ref.dtype)[None]


def _compute_taps_dxcat(x_vmem_slot, k_ref, o_ref, xcat, th: int, w: int):
    """dx-concat variant: build A[(th+2), w, 3C] (the three dx-shifted
    windows concatenated along channels) once, then the conv is THREE
    aligned matmuls with contraction 3C — one per dy, each a free
    leading-dim slice of A — instead of nine. Cuts f32-accumulator
    read-modify-write passes 9 → 3 (the acc is VMEM-resident at these tile
    sizes, so acc traffic is a first-order cost). ``k_ref`` must be
    pre-packed as (3, 3C, Cout): K[dy, dx·C+ci, co] = k[dy, dx, ci, co]."""
    c = x_vmem_slot.shape[-1]
    cout = o_ref.shape[-1]
    for dx in range(3):
        xcat[:, :, dx * c : (dx + 1) * c] = x_vmem_slot[:, dx : dx + w, :]
    acc = jnp.zeros((th, w, cout), jnp.float32)
    for dy in range(3):
        acc = acc + jax.lax.dot_general(
            xcat[dy : dy + th],
            k_ref[dy],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = acc.astype(o_ref.dtype)[None]


def _conv_kernel_db_v2(
    x_hbm, k_ref, o_ref, x_vmem, xs, sems, *, th: int, w: int, nh: int, mode: str
):
    """Double-buffered halo DMA + aligned-tap compute (mode 'preshift' or
    'dxcat')."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    lin = b * nh + h
    total = pl.num_programs(0) * nh
    slot = jax.lax.rem(lin, 2)
    nslot = jax.lax.rem(lin + 1, 2)

    def dma_for(linear, slot_idx):
        bb = jax.lax.div(linear, nh)
        hh = jax.lax.rem(linear, nh)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(hh * th, th + 2)],
            x_vmem.at[slot_idx],
            sems.at[slot_idx],
        )

    @pl.when(lin == 0)
    def _():
        dma_for(lin, slot).start()

    @pl.when(lin + 1 < total)
    def _():
        dma_for(lin + 1, nslot).start()

    dma_for(lin, slot).wait()
    if mode == "preshift":
        _compute_taps_preshift(x_vmem[slot], k_ref, o_ref, xs, th, w)
    else:
        _compute_taps_dxcat(x_vmem[slot], k_ref, o_ref, xs, th, w)


def conv3x3_valid_pallas_v2(
    x_padded: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    tile_h: int = 16,
    mode: str = "dxcat",
    vmem_limit_mb: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """VALID 3×3 conv, round-3 aligned-tap formulations (see kernel docs).

    Differences vs ``conv3x3_valid_pallas``: all matmul operands are
    tile-aligned (dx shifts paid once as explicit VPU copies instead of 6
    hidden Mosaic relayouts), the 'dxcat' mode additionally folds dx into
    the contraction dim (3 matmuls, 3 acc passes), and the Mosaic scoped
    VMEM cap is raised (the f32 stack accumulator at 512×640-class tiles
    exceeds the 32 MB default)."""
    assert mode in ("preshift", "dxcat"), mode
    b, hp, wp_orig, c = x_padded.shape
    h, w = hp - 2, wp_orig - 2
    cout = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, c), kernel.shape
    assert h % tile_h == 0, f"H={h} must divide tile_h={tile_h}"
    assert w % 8 == 0, f"W={w} must be 8-aligned for the shifted-copy layout"

    wp = wp_orig
    if wp % 8 != 0:
        x_padded = jnp.pad(x_padded, ((0, 0), (0, 0), (0, 8 - wp % 8), (0, 0)))
        wp = x_padded.shape[2]

    if mode == "dxcat":
        # (3, 3C, Cout): K[dy, dx·C+ci, co] = kernel[dy, dx, ci, co].
        kpacked = kernel.reshape(3, 3 * c, cout)
        xs_scratch = pltpu.VMEM((tile_h + 2, w, 3 * c), x_padded.dtype)
    else:
        kpacked = kernel
        xs_scratch = pltpu.VMEM((3, tile_h + 2, w, c), x_padded.dtype)

    nh = h // tile_h
    grid = (b, nh)
    kernel_fn = functools.partial(
        _conv_kernel_db_v2, th=tile_h, w=w, nh=nh, mode=mode
    )
    flops = 2 * b * h * w * 9 * c * cout
    vmem = pltpu.VMEM if not interpret else None
    anym = pltpu.ANY if not interpret else None
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_padded.size * x_padded.dtype.itemsize
            + b * h * w * cout * x_padded.dtype.itemsize,
            transcendentals=0,
        )
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x_padded.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=anym),
            pl.BlockSpec(memory_space=vmem),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, cout), lambda i, j: (i, j, 0, 0),
            memory_space=vmem,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, wp, c), x_padded.dtype),
            xs_scratch,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        **kwargs,
    )(x_padded, kpacked)


def conv3x3_valid_pallas(
    x_padded: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    tile_h: int = 16,
    double_buffer: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """VALID 3×3 conv of a pre-padded NHWC tensor via Pallas implicit GEMM.

    Requires H (the output height, ``x_padded.shape[1] - 2``) divisible by
    ``tile_h``.
    """
    b, hp, wp, c = x_padded.shape
    h, w = hp - 2, wp - 2
    cout = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, c), kernel.shape
    assert h % tile_h == 0, f"H={h} must divide tile_h={tile_h}"

    # Mosaic DMA slices must be 8-aligned along the sublane (W) dim; pad the
    # (already conv-padded) width up to a multiple of 8 — the tail columns
    # are DMA'd but never read by the compute slices.
    if wp % 8 != 0:
        x_padded = jnp.pad(x_padded, ((0, 0), (0, 0), (0, 8 - wp % 8), (0, 0)))
        wp = x_padded.shape[2]

    vmem = pltpu.VMEM if (_HAVE_PLTPU and not interpret) else None
    grid = (b, h // tile_h)
    out_spec = pl.BlockSpec(
        (1, tile_h, w, cout), lambda i, j: (i, j, 0, 0), memory_space=vmem
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY if (_HAVE_PLTPU and not interpret) else None),
        pl.BlockSpec(memory_space=vmem),  # kernel resident in VMEM
    ]
    if double_buffer and not interpret:
        kernel_fn = functools.partial(
            _conv_kernel_db, th=tile_h, w=w, nh=h // tile_h
        )
        scratch = [
            pltpu.VMEM((2, tile_h + 2, wp, c), x_padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel_fn = functools.partial(_conv_kernel, th=tile_h, w=w)
        scratch = [
            pltpu.VMEM((tile_h + 2, wp, c), x_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ]
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x_padded.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        interpret=interpret,
    )(x_padded, kernel)

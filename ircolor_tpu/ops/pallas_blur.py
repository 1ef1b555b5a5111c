"""Pallas blur-pool downsample kernels (filt 3, stride 2, reflect pad).

The reference's ``Downsample`` (`/root/reference/Code/ir_colorization.py:
269-310`) with the default binomial-3 filter computes, separably per axis,

    y[i] = (x[2i−1] + 2·x[2i] + x[2i+1]) / 4     (x[−1] ≡ x[1], reflect)

Pure bandwidth: read the plane once, write a quarter of it. XLA's best
formulations (the banded-matrix einsum — which XLA itself rewrites into
convolutions, see tools/blurprobe.py — and the depthwise conv) both measure
~6 ms at 16×512×640×128 bf16 where the roofline is ~1.2 ms.

Two kernels:

* ``blur_downsample_pallas`` (round 2, unwired — measured 7.1 vs XLA 6.4
  ms): W-axis stride-2 pairing done OUTSIDE the kernel by the reshape
  (B,H,W,C) → (B,H,W/2,2C). That reshape is NOT free in tiled HBM layout
  (lane regrouping ⇒ a relayout copy outside the kernel), which is the
  likely loss.
* ``norm_relu_blur_down_pallas`` (round 3): consumes the UNRESHAPED conv
  output plus its instance-norm ``(mean, inv)`` and applies
  normalize+ReLU on load — fusing the generator down-stage's
  IN-normalize + ReLU + reflect-pad + blur-pool (ref :469-482 down path)
  into one read + one quarter-write. W-phase split happens in-VMEM
  (sublane strided slices). Normalize/ReLU commute with the reflect
  halos, so normalizing raw halo rows is exact.
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


def _halo_stream(x_hbm, x_vmem, sems, *, nh: int):
    """Double-buffered halo-row DMA for the (B, nh) blur grids: every tile
    reads input rows [max(2·r0·th − 1, 0), +2th+1) of its batch image. Issues
    the prefetch for tile lin+1, waits on tile lin, and returns the VMEM slot
    holding it. ``th`` and the row count come from the scratch shape."""
    rows = x_vmem.shape[1]  # 2·th + 1
    th = (rows - 1) // 2
    lin = pl.program_id(0) * nh + pl.program_id(1)
    total = pl.num_programs(0) * nh
    slot = jax.lax.rem(lin, 2)
    nslot = jax.lax.rem(lin + 1, 2)

    def dma_for(linear, slot_idx):
        bb = jax.lax.div(linear, nh)
        hh = jax.lax.rem(linear, nh)
        s = jnp.maximum(2 * hh * th - 1, 0)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(s, rows)], x_vmem.at[slot_idx], sems.at[slot_idx]
        )

    @pl.when(lin == 0)
    def _():
        dma_for(lin, slot).start()

    @pl.when(lin + 1 < total)
    def _():
        dma_for(lin + 1, nslot).start()

    dma_for(lin, slot).wait()
    return slot


def _kernel(x_hbm, o_ref, x_vmem, sems, *, th: int, nh: int, c: int):
    h = pl.program_id(1)
    slot = _halo_stream(x_hbm, x_vmem, sems, nh=nh)
    buf = x_vmem[slot].astype(jnp.float32)  # (2th+1, W/2, 2C)

    w2 = buf.shape[1]
    b0 = buf[0 : 2 * th].reshape(th, 2, w2, 2 * c)
    b1 = buf[1 : 2 * th + 1].reshape(th, 2, w2, 2 * c)
    first = h == 0
    # Tile 0 buffers x rows [0 : 2th+1]; others buffer [2r0−1 : 2r0+2th].
    xe = jnp.where(first, b0[:, 0], b1[:, 0])  # row x[2i]
    xo = jnp.where(first, b0[:, 1], b1[:, 1])  # row x[2i+1]
    xm = jnp.where(
        first,
        jnp.concatenate([b0[0:1, 1], b0[:-1, 1]], axis=0),  # x[2i−1], x[−1]≡x[1]
        b0[:, 0],
    )
    yh = xm + 2.0 * xe + xo  # (th, W/2, 2C): [.., :C] = col 2w', [.., C:] = 2w'+1

    ye, yo_ = yh[:, :, :c], yh[:, :, c:]
    ym = jnp.concatenate([yo_[:, 0:1], yo_[:, :-1]], axis=1)  # col 2w'−1, reflect
    o_ref[...] = ((ym + 2.0 * ye + yo_) * (1.0 / 16.0)).astype(o_ref.dtype)[None]


_VMEM_LIMIT = 64 * 1024 * 1024  # raiseable on v5e (CLAUDE.md vmem note)


def _pick_tile(
    h2: int, w: int = 0, c: int = 0, limit: int = _VMEM_LIMIT
) -> int | None:
    """Largest H-tile whose VMEM footprint (double-buffered bf16 scratch +
    ~6 f32 tile temporaries, which Mosaic's OOM accounting includes) stays
    well under the scoped limit. ``limit`` must match the vmem_limit_bytes
    the caller actually compiles with — at the 512×640 down-stage shapes a
    96 MB cap admits th=8 where the 64 MB default would force th=4."""
    for th in (16, 8, 4, 2):
        if h2 % th != 0 or h2 // th < 2:
            continue
        if w and c:
            scratch = 2 * (2 * th + 1) * w * c * 2
            temps = 8 * (2 * th + 1) * w * c * 4
            if scratch + temps > int(limit * 0.75):
                continue
        return th
    return None


def supported(shape: tuple[int, ...]) -> bool:
    _, h, w, c = shape
    return h % 2 == 0 and w % 2 == 0 and _pick_tile(h // 2, w, c) is not None


def norm_blur_supported(shape: tuple[int, ...]) -> bool:
    """Shapes ``norm_relu_blur_down_pallas`` can run on real TPU: even H/W
    with a valid H-tile under the kernel's actual 96 MB VMEM cap, and
    C % 128 == 0 (Mosaic halo-DMA lane tiling)."""
    _, h, w, c = shape
    return (
        h % 2 == 0
        and w % 2 == 0
        and _pick_tile(h // 2, w, c, limit=96 * 1024 * 1024) is not None
        and c % 128 == 0
    )


def blur_downsample_pallas(x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """(B,H,W,C) → (B,H/2,W/2,C) binomial-3 reflect blur-pool."""
    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    th = _pick_tile(h2, w, c)
    assert th is not None and h % 2 == 0 and w % 2 == 0, x.shape
    nh = h2 // th
    xr = x.reshape(b, h, w2, 2 * c)  # contiguous: W-phases land in lanes
    vmem = pltpu.VMEM if (_HAVE_PLTPU and not interpret) else None
    return pl.pallas_call(
        functools.partial(_kernel, th=th, nh=nh, c=c),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, c), x.dtype),
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec(
                memory_space=pltpu.ANY if (_HAVE_PLTPU and not interpret) else None
            )
        ],
        out_specs=pl.BlockSpec(
            (1, th, w2, c), lambda i, j: (i, j, 0, 0), memory_space=vmem
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * th + 1, w2, 2 * c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=(
            None
            if interpret or not _HAVE_PLTPU
            else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
        ),
        interpret=interpret,
    )(xr)


def _kernel_norm(x_hbm, m_ref, i_ref, o_ref, x_vmem, sems, *, th: int, nh: int):
    """Normalize+ReLU-on-load blur-pool over UNRESHAPED (B, H, W, C) input.

    Output tile = ``th`` rows of the (B, H/2, W/2, C) result; the DMA pulls
    the 2·th+1 input rows it needs (top halo row included; the bottom halo
    is never read by a stride-2 filt-3 window on even H). W-phase split is
    in-VMEM: outer-dim (row) slices are free, the stride-2 sublane slices
    along W lower to vector shuffles.
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    slot = _halo_stream(x_hbm, x_vmem, sems, nh=nh)
    buf = x_vmem[slot].astype(jnp.float32)  # (2th+1, W, C)
    mean = m_ref[b]
    inv = i_ref[b]
    buf = jnp.maximum((buf - mean[None, None, :]) * inv[None, None, :], 0.0)

    first = h == 0
    # Tile 0 buffers x rows [0 : 2th+1]; others buffer [2r0−1 : 2r0+2th].
    b0 = buf[0 : 2 * th].reshape(th, 2, buf.shape[1], buf.shape[2])
    b1 = buf[1 : 2 * th + 1].reshape(th, 2, buf.shape[1], buf.shape[2])
    xe = jnp.where(first, b0[:, 0], b1[:, 0])  # x[2i]
    xo = jnp.where(first, b0[:, 1], b1[:, 1])  # x[2i+1]
    xm = jnp.where(
        first,
        jnp.concatenate([b0[0:1, 1], b0[:-1, 1]], axis=0),  # x[2i−1], x[−1]≡x[1]
        b0[:, 0],
    )
    yh = xm + 2.0 * xe + xo  # (th, W, C)

    # W phase split. Strided slices (yh[:, 0::2]) emit gather, which Mosaic
    # cannot lower (>2-D); lax.slice with strides trips a vector.extract
    # verification error. The reshape split is the one form that lowers.
    w = yh.shape[1]
    yhr = yh.reshape(yh.shape[0], w // 2, 2, yh.shape[2])
    ye = yhr[:, :, 0]  # col 2w'
    yo_ = yhr[:, :, 1]  # col 2w'+1
    ym = jnp.concatenate([yo_[:, 0:1], yo_[:, :-1]], axis=1)  # col 2w'−1, reflect
    o_ref[...] = ((ym + 2.0 * ye + yo_) * (1.0 / 16.0)).astype(o_ref.dtype)[None]


def norm_relu_blur_down_pallas(
    x: jnp.ndarray,
    mean: jnp.ndarray,
    inv: jnp.ndarray,
    *,
    vmem_limit_mb: int = 96,
    tile_h: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B,H,W,C) raw conv output + per-(B,C) IN ``(mean, inv_std)`` →
    binomial-3 reflect blur-pool of ``relu((x − mean)·inv)``, (B,H/2,W/2,C).

    Fuses the down-stage chain IN-normalize → ReLU → ReflectPad(1) →
    depthwise blur stride 2 (ref `/root/reference/Code/ir_colorization.py:
    269-310, 469-482`) into one HBM read + one quarter-size write.
    Requires even H/W and C % 128 == 0 (Mosaic DMA lane tiling — the same
    constraint as conv3x3_sum_fused).
    """
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, x.shape
    assert interpret or c % 128 == 0, (
        f"norm_relu_blur_down_pallas: C={c} not 128-aligned for halo DMA"
    )
    assert mean.shape == (b, c) and inv.shape == (b, c), (mean.shape, inv.shape)
    h2, w2 = h // 2, w // 2
    th = tile_h or _pick_tile(h2, w, c, limit=vmem_limit_mb * 1024 * 1024)
    assert th is not None and h2 % th == 0, (x.shape, th)
    nh = h2 // th
    vmem = pltpu.VMEM if (_HAVE_PLTPU and not interpret) else None
    return pl.pallas_call(
        functools.partial(_kernel_norm, th=th, nh=nh),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, c), x.dtype),
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec(
                memory_space=pltpu.ANY if (_HAVE_PLTPU and not interpret) else None
            ),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w2, c), lambda i, j: (i, j, 0, 0), memory_space=vmem
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * th + 1, w, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=(
            None
            if interpret or not _HAVE_PLTPU
            else pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
        ),
        interpret=interpret,
    )(x, mean.astype(jnp.float32), inv.astype(jnp.float32))


def norm_relu_blur_down(
    x: jnp.ndarray, *, matmul_bwd: bool = True, interpret: bool = False
) -> jnp.ndarray:
    """Differentiable down-stage tail: ``blurpool(relu(IN(x)))`` with the
    fused normalize-on-load Pallas kernel as the forward
    (``norm_relu_blur_down_pallas``; IN stats by XLA reduce).

    The manual-DMA kernel has no autodiff rule, so the backward is
    hand-assembled XLA math (same shape as ``resnet_block_pallas``'s
    custom_vjp): recompute ``ŷ = (x−μ)·inv`` elementwise from the saved
    stats, push the cotangent through the blur-pool adjoint (``jax.vjp`` of
    the linear XLA blur — one transposed conv), mask by ReLU, and apply the
    closed-form instance-norm backward. Training therefore pays the fused
    one-read/quarter-write forward price. ``matmul_bwd`` picks the blur-VJP
    form (transposed banded matmuls, the shipped default, vs the dilated-
    depthwise autodiff conv) — threaded from the generator's
    ``blur_matmul_bwd`` so the opt-out knob governs this path too (both
    forms are exact adjoints; only timing differs).
    """
    return _nrbd_vjp(interpret, matmul_bwd, x)


def _nrbd_primal(interpret, x):
    from ircolor_tpu.ops.norm import instance_norm_stats

    mean, inv = instance_norm_stats(x)
    return norm_relu_blur_down_pallas(x, mean, inv, interpret=interpret), (mean, inv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _nrbd_vjp(interpret, matmul_bwd, x):
    return _nrbd_primal(interpret, x)[0]


def _nrbd_fwd(interpret, matmul_bwd, x):
    out, (mean, inv) = _nrbd_primal(interpret, x)
    return out, (x, mean, inv)


def _nrbd_bwd(interpret, matmul_bwd, res, g):
    from ircolor_tpu.ops.blurpool import blur_downsample
    from ircolor_tpu.ops.pallas_resblock import _in_bwd

    x, mean, inv = res
    yhat = (x.astype(jnp.float32) - mean[:, None, None, :]) * inv[:, None, None, :]
    z = jnp.maximum(yhat, 0.0).astype(x.dtype)
    # blur_downsample is linear: its vjp IS the transposed operator; the
    # matmul_bwd flag picks the transposed-banded-matmul form (the shipped
    # default, −4.6 ms/step vs the dilated-depthwise autodiff conv) or the
    # depthwise autodiff form, honoring the generator-level knob. Safe
    # here: the nb kernels never run on multi-device GSPMD meshes.
    _, blur_vjp = jax.vjp(lambda t: blur_downsample(t, matmul_bwd=matmul_bwd), z)
    (dz,) = blur_vjp(g)
    dn = dz.astype(jnp.float32) * (yhat > 0)
    return (_in_bwd(dn, yhat, inv).astype(x.dtype),)


_nrbd_vjp.defvjp(_nrbd_fwd, _nrbd_bwd)

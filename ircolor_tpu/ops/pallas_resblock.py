"""Round-3 fused ResNet-block conv: reflect halos in-kernel, dx-concat MXU
schedule, IN fused at both ends.

The generator's 9 bottleneck ResnetBlocks (ref
`/root/reference/Code/ir_colorization.py:362-418`: ReflectPad(1) → Conv3×3 →
IN → ReLU → ReflectPad(1) → Conv3×3 → IN, +residual) are bandwidth-floor
bound under XLA: each pad materializes a copy, each IN is a read(+write), so
one block costs ~13 HBM tensor passes. This kernel collapses a whole
conv(+pre-IN+ReLU)(+post-IN stats) stage into ONE read + ONE write:

* **Reflect halos in the input DMA** — input is the UNPADDED (B, H, W, C)
  tensor. H-axis: interior tiles DMA rows [r0−1, r0+th+1); boundary tiles
  DMA the clamped range and restore the reflected row with a 1-row VMEM copy
  (row −1 ≡ row 1, row H ≡ row H−2 — PyTorch ReflectionPad2d(1) semantics).
  W-axis: the dx-shifted copies that build the matmul operand read the
  reflected columns directly (col −1 ≡ col 1, col W ≡ col W−2). No padded
  tensor ever exists in HBM.
* **Normalize+ReLU on load** (optional ``mean``/``inv``): the previous
  conv's instance norm + ReLU are applied to the VMEM-resident input tile,
  so IN₁ costs zero HBM traffic. Reflect padding commutes with per-channel
  affine normalization and ReLU, so normalizing the raw halo rows is exact.
* **dx-concat compute** (see ``pallas_conv._compute_taps_dxcat``): the three
  dx-shifted windows are packed along channels once, making the conv three
  tile-aligned 3C-contraction matmuls (vs nine sublane-misaligned taps).
* **Stats epilogue**: Σy and Σy² per (batch, channel) accumulate across
  H-tiles in a revisited (1, 2, C) output block — IN₂'s reduce pass is free.
* **Double-buffered halo DMA** so the HBM read of tile j+1 overlaps tile
  j's matmuls. (Measured r3, tools/bwbench.py: the kernel is COMPUTE-bound
  at the bottleneck shape — 4.07 ms/block in context vs a 3.92 ms MXU
  floor + 0.75 ms elementwise, i.e. at/below the additive floor — so the
  DMA overlap is doing its job and there is no meaningful headroom left
  inside the kernel.)

A full ResnetBlock is then::

    raw1, m1, i1 = conv3x3_reflect_fused(x,    k1)            # read x, write raw1
    raw2, m2, i2 = conv3x3_reflect_fused(raw1, k2, m1, i1)    # read raw1, write raw2
    out = x + (raw2 - m2[:, None, None]) * i2[:, None, None]  # one XLA elementwise

≈6 HBM tensor passes per block instead of ~13.

Status: SHIPPED default-on (Config.pallas_block, area/launch gates in
models/generator.py) — 4.07 vs 5.64 ms/block in-graph, −6.8 ms full
forward at 512×640 b16 (docs/PERF.md round 3). The custom_vjp BACKWARD is
also shipped fused (Config.pallas_block_bwd="fused_wg":
conv3x3_dgrad_fused + conv3x3_wgrad_fused below) — 268.9 → 247.6 ms/step
at b8 512×640. Correctness-tested in interpret mode
(`tests/test_pallas_resblock.py`) against the XLA reflect-pad/conv/IN
chain and its autodiff; on-hardware parity via tools/pallassmoke.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# No try/except fallback: every code path here (including interpret-mode
# tests, whose scratch_shapes use pltpu.VMEM/SemaphoreType) needs this
# module, and it imports fine on CPU-only installs — only *running* the
# compiled kernel needs a TPU (callers gate on that via the models'
# _pallas_available()).
from jax.experimental.pallas import tpu as pltpu

from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.padding import reflect_pad2d

_EPS = 1e-5


def _halo_copy(
    x_hbm, x_vmem, sems, bb, hh, slot, *, th: int, h: int, nh: int,
    halo: str = "reflect", top_hbm=None, bot_hbm=None,
):
    """The (branch-static) halo DMA descriptor set for tile ``hh``.

    Returns a list of (when_predicate | None, copy) pairs; ``None`` means
    unconditional. Every branch uses static sizes — Mosaic DMAs cannot be
    variable-length — so boundary tiles get their own descriptors.

    ``halo="provided"``: the HBM tensor is a SLAB whose first and last rows
    ARE the halo rows (h = tile rows + 2, attached by the caller). Every
    tile then reads rows [hh·th, hh·th + th + 2) — one unconditional
    descriptor, no boundary branches, no reflect fixups.

    ``halo="separate"``: interior rows come from the UNPADDED ``x_hbm`` and
    the two global halo rows from the 1-row ``top_hbm``/``bot_hbm``
    operands (e.g. neighbor-shard rows ppermuted in by the shard_map
    spatial wrapper). Avoids the full slab copy ``provided`` would need the
    caller to materialize — the activation itself is still read exactly
    once.
    """
    if halo == "provided":
        return [(None, pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(hh * th, th + 2)],
            x_vmem.at[slot],
            sems.at[slot],
        ))]
    if halo == "separate":
        top = pltpu.make_async_copy(
            top_hbm.at[bb], x_vmem.at[slot, pl.ds(0, 1)], sems.at[slot]
        )
        bot = pltpu.make_async_copy(
            bot_hbm.at[bb], x_vmem.at[slot, pl.ds(th + 1, 1)], sems.at[slot]
        )
        if nh == 1:
            main = pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(0, th)],
                x_vmem.at[slot, pl.ds(1, th)],
                sems.at[slot],
            )
            return [(None, main), (None, top), (None, bot)]
        first = pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(0, th + 1)],
            x_vmem.at[slot, pl.ds(1, th + 1)],
            sems.at[slot],
        )
        last = pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(h - th - 1, th + 1)],
            x_vmem.at[slot, pl.ds(0, th + 1)],
            sems.at[slot],
        )
        mid = pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(hh * th - 1, th + 2)],
            x_vmem.at[slot],
            sems.at[slot],
        )
        return [(hh == 0, first), (hh == 0, top),
                (hh == nh - 1, last), (hh == nh - 1, bot),
                (jnp.logical_and(hh != 0, hh != nh - 1), mid)]
    if nh == 1:
        # Single tile: rows 0..h-1 land in slots 1..h; slots 0 and h+1 are
        # restored from the reflected rows after the wait.
        return [(None, pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(0, h)],
            x_vmem.at[slot, pl.ds(1, h)],
            sems.at[slot],
        ))]
    first = pltpu.make_async_copy(
        x_hbm.at[bb, pl.ds(0, th + 1)],
        x_vmem.at[slot, pl.ds(1, th + 1)],
        sems.at[slot],
    )
    last = pltpu.make_async_copy(
        x_hbm.at[bb, pl.ds(h - th - 1, th + 1)],
        x_vmem.at[slot, pl.ds(0, th + 1)],
        sems.at[slot],
    )
    mid = pltpu.make_async_copy(
        x_hbm.at[bb, pl.ds(hh * th - 1, th + 2)],
        x_vmem.at[slot],
        sems.at[slot],
    )
    return [(hh == 0, first), (hh == nh - 1, last),
            (jnp.logical_and(hh != 0, hh != nh - 1), mid)]


def _grid_slots(nh: int):
    """(b, hh, lin, total, slot, nslot) for the (B, nh) grid's
    double-buffered DMA bookkeeping — shared by every kernel here."""
    b = pl.program_id(0)
    hh = pl.program_id(1)
    lin = b * nh + hh
    total = pl.num_programs(0) * nh
    return b, hh, lin, total, jax.lax.rem(lin, 2), jax.lax.rem(lin + 1, 2)


def _run_dma(all_copies, linear, slot_idx, action: str):
    for pred, cp in all_copies(linear, slot_idx):
        if pred is None:
            getattr(cp, action)()
        else:
            @pl.when(pred)
            def _(cp=cp):
                getattr(cp, action)()


def _dma_prologue(all_copies, lin, total, slot, nslot):
    """Double-buffered prefetch discipline: on the first grid step start
    tile ``lin``'s copies; always start tile ``lin+1``'s into the other
    slot; wait for ``lin``'s. ``all_copies(linear, slot_idx)`` returns the
    (predicate | None, copy) descriptor list for one tile."""

    @pl.when(lin == 0)
    def _():
        _run_dma(all_copies, lin, slot, "start")

    @pl.when(lin + 1 < total)
    def _():
        _run_dma(all_copies, lin + 1, nslot, "start")

    _run_dma(all_copies, lin, slot, "wait")


def _kernel(
    x_hbm, k_ref, *rest, th: int, w: int, h: int, nh: int,
    norm_in: bool, halo: str = "reflect",
):
    i = 0
    m_ref = i_ref = top_hbm = bot_hbm = None
    if norm_in:
        m_ref, i_ref = rest[0], rest[1]
        i = 2
    if halo == "separate":
        top_hbm, bot_hbm = rest[i], rest[i + 1]
        i += 2
    o_ref, s_ref, x_vmem, xcat, sems = rest[i:]

    b, hh, lin, total, slot, nslot = _grid_slots(nh)

    def all_copies(linear, slot_idx):
        bb = jax.lax.div(linear, nh)
        jj = jax.lax.rem(linear, nh)
        return _halo_copy(x_hbm, x_vmem, sems, bb, jj, slot_idx,
                          th=th, h=h, nh=nh, halo=halo,
                          top_hbm=top_hbm, bot_hbm=bot_hbm)

    _dma_prologue(all_copies, lin, total, slot, nslot)

    # H-axis reflect fixups (1-row VMEM copies, boundary tiles only). With
    # provided/separate halos the tile's edge rows already hold the right
    # values (slab rows / DMA'd 1-row neighbor tensors).
    if halo in ("provided", "separate"):
        pass
    elif nh == 1:
        x_vmem[slot, 0] = x_vmem[slot, 2]
        x_vmem[slot, th + 1] = x_vmem[slot, th - 1]
    else:
        @pl.when(hh == 0)
        def _():
            x_vmem[slot, 0] = x_vmem[slot, 2]

        @pl.when(hh == nh - 1)
        def _():
            x_vmem[slot, th + 1] = x_vmem[slot, th - 1]

    xin = x_vmem[slot]
    c = xin.shape[-1]
    if norm_in:
        mean = m_ref[b]  # (C,) rows of the whole (B, C) VMEM-resident stats
        inv = i_ref[b]
        xin = (xin.astype(jnp.float32) - mean[None, None, :]) * inv[None, None, :]
        xin = jnp.maximum(xin, 0.0).astype(x_vmem.dtype)

    # dx-concat operand with W-axis reflect: xcat[r, x, dx·C+ci] =
    # xin[r, reflect(x+dx−1), ci].
    xcat[:, :, c : 2 * c] = xin
    xcat[:, 1:, 0:c] = xin[:, : w - 1]
    xcat[:, 0:1, 0:c] = xin[:, 1:2]
    xcat[:, : w - 1, 2 * c :] = xin[:, 1:]
    xcat[:, w - 1 : w, 2 * c :] = xin[:, w - 2 : w - 1]

    cout = o_ref.shape[-1]
    acc = jnp.zeros((th, w, cout), jnp.float32)
    for dy in range(3):
        acc = acc + jax.lax.dot_general(
            xcat[dy : dy + th],
            k_ref[dy],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = acc.astype(o_ref.dtype)[None]

    # Stats epilogue: Σy / Σy² per channel, accumulated over H-tiles.
    tile = jnp.stack(
        [jnp.sum(acc, axis=(0, 1)), jnp.sum(acc * acc, axis=(0, 1))]
    )[None]

    @pl.when(hh == 0)
    def _():
        s_ref[...] = tile

    @pl.when(hh != 0)
    def _():
        s_ref[...] = s_ref[...] + tile


def conv3x3_reflect_fused(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    mean: jnp.ndarray | None = None,
    inv: jnp.ndarray | None = None,
    *,
    tile_h: int = 16,
    vmem_limit_mb: int = 100,
    halo: str = "reflect",
    halo_rows: tuple | None = None,
    stats_axis: str | None = None,
    interpret: bool = False,
):
    """Reflect-padded 3×3 conv of UNPADDED ``x`` (B, H, W, C) → raw output
    plus per-(B, C) instance-norm ``(mean, inv_std)`` of that output.

    With ``mean``/``inv`` given, the input is instance-normalized and ReLU'd
    on load (fusing the previous conv's IN+ReLU). See module docstring.
    Requires H % tile_h == 0 and W % 8 == 0 (true for all generator
    bottleneck shapes: 128×160, 64×64, …).

    Spatial-sharding halo contracts (see ``resnet_block_pallas_spatial``):
    ``halo="provided"`` — ``x`` is a SLAB of H+2 rows whose first and last
    rows are caller-supplied halo rows; output has H rows. ``halo=
    "separate"`` — ``x`` stays unpadded and ``halo_rows=(top, bot)`` are
    (B, 1, W, C) tensors DMA'd into the tile edges in-kernel (no slab
    materialization: the activation is still read exactly once).
    ``stats_axis``: psum the Σy/Σy² stats over that named axis (the
    per-(B, C) IN moments then cover the GLOBAL image, exactly as the
    single-device kernel's do).
    """
    assert halo in ("reflect", "provided", "separate"), halo
    assert (halo_rows is not None) == (halo == "separate"), halo
    b, h, w, c = x.shape
    if halo == "provided":
        h -= 2  # interior rows; x carries one halo row at each end
    cout = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, c), kernel.shape
    assert h % tile_h == 0, f"H={h} must divide tile_h={tile_h}"
    assert w % 8 == 0, f"W={w} must be 8-aligned"
    # Mosaic halo-DMA lane tiling (same constraint as conv3x3_sum_fused).
    assert interpret or c % 128 == 0, (
        f"conv3x3_reflect_fused: input C={c} not 128-aligned — Mosaic "
        "cannot DMA-slice sub-lane-tile channel extents"
    )
    norm_in = mean is not None
    nh = h // tile_h

    kpacked = kernel.reshape(3, 3 * c, cout)  # K[dy, dx·C+ci, co]

    vmem = pltpu.VMEM if not interpret else None
    anym = pltpu.ANY if not interpret else None
    in_specs = [pl.BlockSpec(memory_space=anym), pl.BlockSpec(memory_space=vmem)]
    operands = [x, kpacked]
    if norm_in:
        stat_spec = pl.BlockSpec(memory_space=vmem)  # whole (B, C) arrays
        in_specs += [stat_spec, stat_spec]
        operands += [mean, inv]
    if halo == "separate":
        top, bot = halo_rows
        assert top.shape == bot.shape == (b, 1, w, c), (top.shape, x.shape)
        in_specs += [pl.BlockSpec(memory_space=anym)] * 2
        operands += [top.astype(x.dtype), bot.astype(x.dtype)]

    kernel_fn = functools.partial(
        _kernel, th=tile_h, w=w, h=h, nh=nh, norm_in=norm_in, halo=halo
    )
    kwargs = {}
    if not interpret:
        flops = 2 * b * h * w * 9 * c * cout
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + b * h * w * cout) * x.dtype.itemsize,
            transcendentals=0,
        )
    out, stats = pl.pallas_call(
        kernel_fn,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
            jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
        ),
        grid=(b, nh),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, tile_h, w, cout), lambda i, j: (i, j, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 2, cout), lambda i, j: (i, 0, 0),
                         memory_space=vmem),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, w, c), x.dtype),
            pltpu.VMEM((tile_h + 2, w, 3 * c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        **kwargs,
    )(*operands)
    n = h * w
    if stats_axis is not None:
        stats = jax.lax.psum(stats, stats_axis)
        n *= jax.lax.axis_size(stats_axis)
    mean_out = stats[:, 0] / n
    var = stats[:, 1] / n - mean_out * mean_out
    inv_out = jax.lax.rsqrt(var + _EPS)
    return out, mean_out, inv_out


def resnet_block_pallas(
    x: jnp.ndarray,
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    *,
    tile_h: int = 16,
    bwd: str = "xla",
    interpret: bool = False,
) -> jnp.ndarray:
    """One full ResnetBlock (ref :362-418) via two fused kernel launches +
    one XLA elementwise pass (final IN normalize + residual add).

    Differentiable (``jax.custom_vjp``): the manual-DMA kernel has no
    autodiff rule, so the backward is hand-derived math over residuals
    the forward already produced (raw conv outputs + IN stats).

    ``bwd`` selects the backward implementation:

    * ``"xla"`` — XLA ops: 2 elementwise recomputes, closed-form IN
      backward, and the same 4 convs (2 dgrad + 2 wgrad) XLA autodiff
      would emit. Training pays the fused-forward price (4.07 ms/block
      vs the XLA chain's 5.64) with a stock backward.
    * ``"fused"`` — the dgrad side runs as two fused Pallas launches
      (``conv3x3_dgrad_fused``): IN-backward applied on load, zero halos
      in the input DMA, the reflect-pad VJP fold computed tile-locally
      in-kernel, ReLU mask + next-IN-backward stats as epilogue, and the
      residual add fused into the second launch. Only the 2 wgrads stay
      XLA. No padded dy tensor and none of the f32 elementwise
      intermediates ever reach HBM.
    * ``"fused_wg"`` — additionally runs both wgrads as fused launches
      (``conv3x3_wgrad_fused``: z and dy recomputed on load from the
      saved raws, reflect halos in-DMA, per-tap MXU contractions into a
      VMEM-resident accumulator); the dgrad launches stop emitting dy.

    Conv *bias* params are mathematically inert through instance norm
    (IN(x + b) ≡ IN(x)); the XLA path autodiffs them to ~0 (rounding-level)
    grads while this path never sees them (exact-0 grads via flax's
    unused-param rule) — both train the same function.
    """
    assert bwd in ("xla", "fused", "fused_wg"), bwd
    return _resblock_vjp(tile_h, interpret, bwd, x, k1, k2)


def _resblock_primal(tile_h, interpret, x, k1, k2):
    raw1, m1, i1 = conv3x3_reflect_fused(x, k1, tile_h=tile_h, interpret=interpret)
    raw2, m2, i2 = conv3x3_reflect_fused(
        raw1, k2, m1, i1, tile_h=tile_h, interpret=interpret
    )
    y = (raw2.astype(jnp.float32) - m2[:, None, None, :]) * i2[:, None, None, :]
    out = x + y.astype(x.dtype)
    return out, (raw1, m1, i1, raw2, m2, i2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _resblock_vjp(tile_h, interpret, bwd, x, k1, k2):
    return _resblock_primal(tile_h, interpret, x, k1, k2)[0]


def _resblock_fwd(tile_h, interpret, bwd, x, k1, k2):
    out, (raw1, m1, i1, raw2, m2, i2) = _resblock_primal(tile_h, interpret, x, k1, k2)
    return out, (x, k1, k2, raw1, m1, i1, raw2, m2, i2)


def _in_bwd(g, yhat, inv):
    """VJP of y → (y − mean(y))·inv(y) over spatial axes, per (batch,
    channel): dL/dy = inv · (g − E[g] − ŷ·E[g·ŷ]); exact with eps folded
    into inv (ŷ and g in f32)."""
    gm = jnp.mean(g, axis=(1, 2), keepdims=True)
    gy = jnp.mean(g * yhat, axis=(1, 2), keepdims=True)
    return inv[:, None, None, :] * (g - gm - yhat * gy)


def _resblock_bwd(tile_h, interpret, bwd, res, g):
    if bwd in ("fused", "fused_wg"):
        return _resblock_bwd_fused(
            tile_h, interpret, res, g, wgrad_fused=bwd == "fused_wg"
        )
    x, k1, k2, raw1, m1, i1, raw2, m2, i2 = res
    gf = g.astype(jnp.float32)

    # Recompute the cheap elementwise intermediates from the saved raws.
    n1 = (raw1.astype(jnp.float32) - m1[:, None, None, :]) * i1[:, None, None, :]
    z1 = jnp.maximum(n1, 0.0).astype(x.dtype)  # conv2's input
    yhat2 = (raw2.astype(jnp.float32) - m2[:, None, None, :]) * i2[:, None, None, :]

    # out = x + IN(conv2(pad(relu(IN(conv1(pad(x))))))) — walk it backward.
    dy2 = _in_bwd(gf, yhat2, i2)

    def pad_conv(z, k):
        return conv2d(reflect_pad2d(z, 1), k, padding="VALID")

    # jax.vjp's primal outputs are unused → XLA DCEs the forward convs;
    # only the dgrad/wgrad convs (which need z1/k2 themselves) remain.
    _, vjp2 = jax.vjp(pad_conv, z1, k2)
    dz1, dk2 = vjp2(dy2.astype(raw2.dtype))

    dn1 = dz1.astype(jnp.float32) * (n1 > 0)
    dy1 = _in_bwd(dn1, n1, i1)
    _, vjp1 = jax.vjp(pad_conv, x, k1)
    dxc, dk1 = vjp1(dy1.astype(raw1.dtype))

    dx = (gf + dxc.astype(jnp.float32)).astype(x.dtype)
    return dx, dk1.astype(k1.dtype), dk2.astype(k2.dtype)


_resblock_vjp.defvjp(_resblock_fwd, _resblock_bwd)


# ---------------------------------------------------------------------------
# Fused BACKWARD (dgrad side): the two dgrad convs of the block's custom_vjp
# as fused Pallas launches, mirroring the forward's one-read/one-write
# schedule. Per launch:
#
# * **IN backward on load**: the conv input is dy = inv·(p − E[p] − n̂·E[p·n̂])
#   (the closed-form IN VJP), computed on the VMEM-resident tiles of the
#   primary cotangent ``p`` and its companion raw tensor (whose normalized
#   form n̂ the IN saw) — neither dy nor any f32 intermediate reaches HBM.
# * **Zero halos in the input DMA**: dgrad of a VALID conv over a padded
#   input is a zero-SAME conv of dy with the rotated/transposed kernel;
#   tile-boundary halo rows are DMA'd neighbor rows, image-edge rows are
#   zero-selected after the transform.
# * **In-kernel reflect-pad VJP fold**: the pad's transpose folds the
#   would-be halo gradients back into rows/cols 1 and H−2/W−2. All fold
#   terms are tile-local (F[−1,x] needs only dy row 0, F[p,−1] only dy
#   col 0, …), so they are tiny extra matmuls against slices of the packed
#   kernel — ~2% of the main contraction, no XLA strip scatters.
# * **Epilogue**: launch 1 masks by the saved ReLU sign (raw1 > m1 ⇔
#   n1 > 0) and emits Σdn1 / Σ(dn1·n̂1) so the NEXT IN backward's reduce is
#   free; launch 2 adds the residual cotangent ``g`` in-register. Each
#   launch also stores dy itself (bf16) for the XLA wgrads.
# ---------------------------------------------------------------------------


def _kernel_dgrad(
    p_hbm, c_hbm, *args,
    th: int, w: int, h: int, nh: int, mask_stats: bool, emit_dy: bool,
    pad: str = "reflect", mask_p: bool = False, use_aux: bool = True,
):
    if use_aux:
        a_hbm = args[0]
        args = args[1:]
    k_ref, m_ref, i_ref, gm_ref, gy_ref = args[:5]
    rest = args[5:]
    dy_ref = None
    if mask_stats:
        mm_ref, mi_ref = rest[0], rest[1]
        rest = rest[2:]
    o_ref = rest[0]
    rest = rest[1:]
    if emit_dy:
        dy_ref = rest[0]
        rest = rest[1:]
    if mask_stats:
        s_ref = rest[0]
        rest = rest[1:]
    if use_aux:
        p_vmem, c_vmem, a_vmem, xcat, sems = rest
    else:
        p_vmem, c_vmem, xcat, sems = rest

    b, hh, lin, total, slot, nslot = _grid_slots(nh)

    def all_copies(linear, slot_idx):
        bb = jax.lax.div(linear, nh)
        jj = jax.lax.rem(linear, nh)
        out = []
        for leg, (hbm, vmem) in enumerate(((p_hbm, p_vmem), (c_hbm, c_vmem))):
            # Reflect-mode DESCRIPTORS only (clamped ranges): the stale
            # image-edge halo rows are zero-SELECTED after the transform,
            # so no fixup copies are needed.
            for pred, cp in _halo_copy(hbm, vmem, sems.at[leg], bb, jj,
                                       slot_idx, th=th, h=h, nh=nh):
                out.append((pred, cp))
        if use_aux:
            out.append((None, pltpu.make_async_copy(
                a_hbm.at[bb, pl.ds(jj * th, th)],
                a_vmem.at[slot_idx],
                sems.at[2, slot_idx],
            )))
        return out

    _dma_prologue(all_copies, lin, total, slot, nslot)

    m = m_ref[b]
    iv = i_ref[b]
    gm = gm_ref[b]
    gy = gy_ref[b]
    pm = p_vmem[slot].astype(jnp.float32)   # (th+2, w, c)
    cmv = c_vmem[slot].astype(jnp.float32)
    if mask_p:
        # ReLU mask on load: the cotangent enters POST-ReLU (the enc/dec
        # conv+IN+ReLU segments); n̂ > 0 ⇔ raw > m since inv > 0.
        pm = jnp.where(cmv > m[None, None, :], pm, 0.0)
    nhat = (cmv - m[None, None, :]) * iv[None, None, :]
    t = iv[None, None, :] * (pm - gm[None, None, :] - nhat * gy[None, None, :])
    # Zero the image-edge halo rows (zero-SAME dgrad semantics) — a SELECT,
    # so stale VMEM garbage (including NaNs) in the unfilled boundary rows
    # is killed, not multiplied.
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    bad = jnp.logical_or(
        jnp.logical_and(hh == 0, rows3 == 0),
        jnp.logical_and(hh == nh - 1, rows3 == th + 1),
    )
    t = jnp.where(bad, 0.0, t)
    tb = t.astype(p_vmem.dtype)
    if emit_dy:
        dy_ref[...] = tb[1 : th + 1][None]

    c = tb.shape[-1]
    xcat[:, :, c : 2 * c] = tb
    xcat[:, 1:, 0:c] = tb[:, : w - 1]
    xcat[:, 0:1, 0:c] = jnp.zeros_like(tb[:, 0:1])
    xcat[:, : w - 1, 2 * c :] = tb[:, 1:]
    xcat[:, w - 1 : w, 2 * c :] = jnp.zeros_like(tb[:, 0:1])

    cout = o_ref.shape[-1]
    acc = jnp.zeros((th, w, cout), jnp.float32)
    for dyt in range(3):
        acc = acc + jax.lax.dot_general(
            xcat[dyt : dyt + th],
            k_ref[dyt],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # Reflect-pad VJP fold, tile-local (pad="zero" — the enc/dec segments'
    # zero-SAME convs — skips it: zero-SAME dgrad IS the base path above).
    # With F = zero-ext conv_full(dy, kdg):
    #   dz[1]   += F[-1] = xcat[1]  @ kdg[2]      (rows -2, -1 are zero)
    #   dz[H-2] += F[H]  = xcat[th] @ kdg[0]
    #   dz[:,1]   += F1[:,-1],  F1[p,-1] = Σ_a dy[p+a-1, 0]   @ kdg[a, 2]
    #   dz[:,W-2] += F1[:, W],  F1[p, W] = Σ_a dy[p+a-1, W-1] @ kdg[a, 0]
    # with the H-fold's own col values (corners) folded into F1 at rows
    # 1 / th-2 of the edge tiles. All adds are VPU selects on iota masks
    # (dynamic_update_slice on tiled dims is a Mosaic lowering risk).
    if pad == "reflect":
        topm = hh == 0
        botm = hh == nh - 1
        dot2 = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rowtop = dot2(xcat[1], k_ref[2])    # (w, cout)
        rowbot = dot2(xcat[th], k_ref[0])
        ri = jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0)
        acc = acc + jnp.where(
            jnp.logical_and(ri == 1, topm), rowtop[None], 0.0
        )
        acc = acc + jnp.where(
            jnp.logical_and(ri == th - 2, botm), rowbot[None], 0.0
        )

        tl = tb[:, 0, :]        # (th+2, c) — dy col 0
        tr = tb[:, w - 1, :]
        colv = jnp.zeros((th, cout), jnp.float32)
        colw = jnp.zeros((th, cout), jnp.float32)
        for a in range(3):
            colv = colv + dot2(tl[a : a + th], k_ref[a, 2 * c : 3 * c])
            colw = colw + dot2(tr[a : a + th], k_ref[a, 0:c])
        # Corner terms: F[-1,∓] / F[H,∓] land at fold rows 1 / th-2 of the
        # edge tiles (dy rows 0 / H-1 are tile rows 1 / th there).
        ctl = dot2(tl[1:2], k_ref[2, 2 * c : 3 * c])    # (1, cout)
        cbl = dot2(tl[th : th + 1], k_ref[0, 2 * c : 3 * c])
        ctr = dot2(tr[1:2], k_ref[2, 0:c])
        cbr = dot2(tr[th : th + 1], k_ref[0, 0:c])
        ri2 = jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)
        colv = colv + jnp.where(jnp.logical_and(ri2 == 1, topm), ctl, 0.0)
        colv = colv + jnp.where(jnp.logical_and(ri2 == th - 2, botm), cbl, 0.0)
        colw = colw + jnp.where(jnp.logical_and(ri2 == 1, topm), ctr, 0.0)
        colw = colw + jnp.where(jnp.logical_and(ri2 == th - 2, botm), cbr, 0.0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
        acc = acc + jnp.where(ci == 1, colv[:, None, :], 0.0)
        acc = acc + jnp.where(ci == w - 2, colw[:, None, :], 0.0)

    if mask_stats:
        av = a_vmem[slot].astype(jnp.float32)   # raw1 tile (th, w, cout)
        mmv = mm_ref[b][None, None, :]
        miv = mi_ref[b][None, None, :]
        # ReLU sign of n1 = (raw1 − m1)·i1: i1 > 0, so n1 > 0 ⇔ raw1 > m1.
        accm = jnp.where(av > mmv, acc, 0.0)
        o_ref[...] = accm.astype(o_ref.dtype)[None]
        nh1 = (av - mmv) * miv
        tile = jnp.stack(
            [jnp.sum(accm, axis=(0, 1)), jnp.sum(accm * nh1, axis=(0, 1))]
        )[None]

        @pl.when(hh == 0)
        def _():
            s_ref[...] = tile

        @pl.when(hh != 0)
        def _():
            s_ref[...] = s_ref[...] + tile
    elif use_aux:
        o_ref[...] = (
            acc + a_vmem[slot].astype(jnp.float32)
        ).astype(o_ref.dtype)[None]
    else:
        o_ref[...] = acc.astype(o_ref.dtype)[None]


def conv3x3_dgrad_fused(
    p: jnp.ndarray,
    comp: jnp.ndarray,
    aux: jnp.ndarray | None,
    kernel_fwd: jnp.ndarray,
    m: jnp.ndarray,
    inv: jnp.ndarray,
    gm: jnp.ndarray,
    gy: jnp.ndarray,
    mask_stats: tuple | None = None,
    *,
    emit_dy: bool = True,
    pad: str = "reflect",
    mask_p: bool = False,
    tile_h: int = 16,
    vmem_limit_mb: int = 100,
    interpret: bool = False,
):
    """Fused dgrad of ``conv2d(reflect_pad2d(·, 1), kernel_fwd, VALID)``
    preceded by an instance norm, for the block backward (ref ResnetBlock,
    `/root/reference/Code/ir_colorization.py:362-418`).

    Computes, in one HBM read per input and one write per output::

        dy  = inv·(p − gm − n̂·gy),  n̂ = (comp − m)·inv     # IN backward
        dz  = reflect_pad_vjp(conv_full(dy, rot180(k)ᵀ))     # dgrad + fold

    With ``mask_stats=(mm, mi)`` (launch 1): returns ``(dz·(aux > mm),
    dy, stats)`` where stats[:, 0] = Σ dn1 and stats[:, 1] = Σ dn1·n̂1 —
    the NEXT IN backward's moments, reduced for free. Without it
    (launch 2): returns ``(dz + aux, dy)`` — the residual cotangent add
    fused in. ``dy`` is stored (in ``p.dtype``) for the XLA wgrads;
    ``emit_dy=False`` drops that output (its slot in the return tuple
    becomes None) when the fused wgrads recompute dy themselves.

    Encoder/decoder-segment options (VERDICT r3 next-step #2): ``pad=
    "zero"`` skips the reflect fold (the enc/dec convs are zero-SAME, ref
    :469-474/:503-507 — zero-SAME dgrad is exactly the base path);
    ``mask_p=True`` applies the ReLU mask to ``p`` on load (cotangent
    entering POST-ReLU; requires gm/gy computed on the masked cotangent);
    ``aux=None`` drops the aux operand entirely (no residual add / no
    mask-stats epilogue — the segment's dz flows to a blur VJP next).
    """
    use_aux = aux is not None
    assert use_aux or mask_stats is None, "mask_stats epilogue needs aux"
    assert pad in ("reflect", "zero"), pad
    b, h, w, c = p.shape
    assert comp.shape == p.shape, (comp.shape, p.shape)
    cin = kernel_fwd.shape[2]
    assert kernel_fwd.shape == (3, 3, cin, c), (kernel_fwd.shape, c)
    assert h % tile_h == 0, f"H={h} must divide tile_h={tile_h}"
    assert tile_h >= 4, tile_h
    assert w % 8 == 0 and w >= 8, f"W={w} must be 8-aligned"
    assert interpret or (
        c % 128 == 0 and (not use_aux or aux.shape[-1] % 128 == 0)
    ), (
        f"conv3x3_dgrad_fused: C={c} not 128-aligned — "
        "Mosaic cannot DMA-slice sub-lane-tile channel extents"
    )
    nh = h // tile_h
    # dgrad kernel: rot180 in space, transposed in channels; packed like
    # the forward ([dy, dx·C+ci, co]) so the fold slices k_ref[a, dx·C:...]
    # recover kdg[a, dx].
    kdg = jnp.transpose(kernel_fwd[::-1, ::-1], (0, 1, 3, 2))
    cout = kdg.shape[-1]
    if use_aux:
        assert aux.shape == (b, h, w, cout), (aux.shape, (b, h, w, cout))
    kpacked = kdg.reshape(3, 3 * c, cout)

    vmem = pltpu.VMEM if not interpret else None
    anym = pltpu.ANY if not interpret else None
    in_specs = [pl.BlockSpec(memory_space=anym)] * (2 + use_aux) + [
        pl.BlockSpec(memory_space=vmem)
    ] * 5
    operands = [p, comp] + ([aux] if use_aux else []) + [kpacked,
                m.astype(jnp.float32), inv.astype(jnp.float32),
                gm.astype(jnp.float32), gy.astype(jnp.float32)]
    out_shape = [jax.ShapeDtypeStruct((b, h, w, cout), p.dtype)]
    out_specs = [
        pl.BlockSpec((1, tile_h, w, cout), lambda i, j: (i, j, 0, 0),
                     memory_space=vmem),
    ]
    if emit_dy:
        out_shape.append(jax.ShapeDtypeStruct((b, h, w, c), p.dtype))
        out_specs.append(
            pl.BlockSpec((1, tile_h, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=vmem)
        )
    if mask_stats is not None:
        mm, mi = mask_stats
        in_specs += [pl.BlockSpec(memory_space=vmem)] * 2
        operands += [mm.astype(jnp.float32), mi.astype(jnp.float32)]
        out_shape.append(jax.ShapeDtypeStruct((b, 2, cout), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 2, cout), lambda i, j: (i, 0, 0),
                         memory_space=vmem)
        )

    kernel_fn = functools.partial(
        _kernel_dgrad, th=tile_h, w=w, h=h, nh=nh,
        mask_stats=mask_stats is not None, emit_dy=emit_dy,
        pad=pad, mask_p=mask_p, use_aux=use_aux,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * b * h * w * 9 * c * cout,
            bytes_accessed=(p.size + comp.size
                            + (aux.size if use_aux else 0)
                            + b * h * w * (cout + c * emit_dy))
            * p.dtype.itemsize,
            transcendentals=0,
        )
    scratch = [
        pltpu.VMEM((2, tile_h + 2, w, c), p.dtype),
        pltpu.VMEM((2, tile_h + 2, w, c), comp.dtype),
    ]
    if use_aux:
        scratch.append(pltpu.VMEM((2, tile_h, w, aux.shape[-1]), aux.dtype))
    scratch += [
        pltpu.VMEM((tile_h + 2, w, 3 * c), p.dtype),
        pltpu.SemaphoreType.DMA((3, 2)),
    ]
    outs = pl.pallas_call(
        kernel_fn,
        out_shape=tuple(out_shape),
        grid=(b, nh),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(*operands)
    outs = list(outs)
    o = outs.pop(0)
    dy = outs.pop(0) if emit_dy else None
    if mask_stats is not None:
        return o, dy, outs[0]
    return o, dy


def _kernel_wgrad(
    z_hbm, p_hbm, c_hbm, m_ref, i_ref, gm_ref, gy_ref, *rest,
    th: int, w: int, h: int, nh: int, norm_z: bool,
    pad: str = "reflect", mask_p: bool = False,
):
    if norm_z:
        zm_ref, zi_ref = rest[0], rest[1]
        rest = rest[2:]
    o_ref, z_vmem, p_vmem, c_vmem, xcat, sems = rest

    b, hh, lin, total, slot, nslot = _grid_slots(nh)

    def all_copies(linear, slot_idx):
        bb = jax.lax.div(linear, nh)
        jj = jax.lax.rem(linear, nh)
        out = []
        for pred, cp in _halo_copy(z_hbm, z_vmem, sems.at[0], bb, jj,
                                   slot_idx, th=th, h=h, nh=nh):
            out.append((pred, cp))
        for leg, (hbm, vmem) in enumerate(((p_hbm, p_vmem), (c_hbm, c_vmem))):
            out.append((None, pltpu.make_async_copy(
                hbm.at[bb, pl.ds(jj * th, th)],
                vmem.at[slot_idx],
                sems.at[leg + 1, slot_idx],
            )))
        return out

    _dma_prologue(all_copies, lin, total, slot, nslot)

    # H-axis pad fixups on the activation leg (the wgrad sees the PADDED
    # activation — same halo semantics as the forward): reflect mirrors
    # interior rows; zero (the enc/dec segments' zero-SAME convs) writes
    # zero rows at the image edges.
    def _top_fix(ref):
        ref[slot, 0] = (
            ref[slot, 2] if pad == "reflect" else jnp.zeros_like(ref[slot, 0])
        )

    def _bot_fix(ref):
        ref[slot, th + 1] = (
            ref[slot, th - 1] if pad == "reflect"
            else jnp.zeros_like(ref[slot, th + 1])
        )

    if nh == 1:
        _top_fix(z_vmem)
        _bot_fix(z_vmem)
    else:
        @pl.when(hh == 0)
        def _():
            _top_fix(z_vmem)

        @pl.when(hh == nh - 1)
        def _():
            _bot_fix(z_vmem)

    zin = z_vmem[slot]
    cz = zin.shape[-1]
    if norm_z:
        zm = zm_ref[b]
        zi = zi_ref[b]
        zin = (zin.astype(jnp.float32) - zm[None, None, :]) * zi[None, None, :]
        zin = jnp.maximum(zin, 0.0).astype(z_vmem.dtype)

    # The cotangent tile: dy = inv·(p − gm − n̂·gy), n̂ = (comp − m)·inv
    # (p ReLU-masked on load when mask_p — the enc/dec segments' cotangent
    # enters POST-ReLU; n̂ > 0 ⇔ comp > m).
    m = m_ref[b]
    iv = i_ref[b]
    gm = gm_ref[b]
    gy = gy_ref[b]
    pm = p_vmem[slot].astype(jnp.float32)
    cmv = c_vmem[slot].astype(jnp.float32)
    if mask_p:
        pm = jnp.where(cmv > m[None, None, :], pm, 0.0)
    nhat = (cmv - m[None, None, :]) * iv[None, None, :]
    dyt = (
        iv[None, None, :] * (pm - gm[None, None, :] - nhat * gy[None, None, :])
    ).astype(p_vmem.dtype)

    # dx-concat operand in the forward layout: xcat[r, q, dx·C+ci] =
    # zpad[r, q+dx−1, ci] — W edges mirror (reflect) or zero (zero-SAME).
    xcat[:, :, cz : 2 * cz] = zin
    xcat[:, 1:, 0:cz] = zin[:, : w - 1]
    xcat[:, 0:1, 0:cz] = (
        zin[:, 1:2] if pad == "reflect" else jnp.zeros_like(zin[:, 0:1])
    )
    xcat[:, : w - 1, 2 * cz :] = zin[:, 1:]
    xcat[:, w - 1 : w, 2 * cz :] = (
        zin[:, w - 2 : w - 1] if pad == "reflect"
        else jnp.zeros_like(zin[:, 0:1])
    )

    # dk[dy] = Σ_{p,q} zpad[p+dy, q+dx, ci]·dy[p, q, co] — one (th·w)-
    # contraction matmul per dy tap, accumulated over the whole grid in
    # the VMEM-resident revisited output block (one HBM write total).
    # Operands are flattened to 2-D and contracted over dim 0 (lhsᵀ·rhs —
    # the MXU's native wgrad form): Mosaic's tpu.matmul rejects multi-dim
    # contractions ("lhs contracting dims must be of size 1", found on
    # hardware — the CPU-side lowering gate does not run that verifier).
    dyf = dyt.reshape(th * w, dyt.shape[-1])
    tile = jnp.stack([
        jax.lax.dot_general(
            xcat[dyt_i : dyt_i + th].reshape(th * w, 3 * cz),
            dyf,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for dyt_i in range(3)
    ])

    @pl.when(lin == 0)
    def _():
        o_ref[...] = tile

    @pl.when(lin != 0)
    def _():
        o_ref[...] = o_ref[...] + tile


def conv3x3_wgrad_fused(
    z: jnp.ndarray,
    p: jnp.ndarray,
    comp: jnp.ndarray,
    m: jnp.ndarray,
    inv: jnp.ndarray,
    gm: jnp.ndarray,
    gy: jnp.ndarray,
    znorm: tuple | None = None,
    *,
    pad: str = "reflect",
    mask_p: bool = False,
    tile_h: int = 16,
    vmem_limit_mb: int = 100,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused wgrad of ``conv2d(reflect_pad2d(Z, 1), k, VALID)`` for the
    block backward: returns ``dk`` (3, 3, Cz, Co) in f32, where::

        Z  = z                          if znorm is None
           = relu((z − zm)·zi)          if znorm = (zm, zi)   # z = saved raw
        dy = inv·(p − gm − n̂·gy),  n̂ = (comp − m)·inv         # IN backward

    Both operands are recomputed on load from the tensors the forward
    already saved — no z/dy materialization, no padded activation in HBM.
    Reflect halos ride the activation DMA exactly as in the forward
    kernel; the 3 dy-tap contractions accumulate into a VMEM-resident
    (3, 3Cz, Co) block flushed once.
    """
    b, h, w, cz = z.shape
    cout = p.shape[-1]
    assert p.shape == (b, h, w, cout) and comp.shape == p.shape
    assert h % tile_h == 0, f"H={h} must divide tile_h={tile_h}"
    assert w % 8 == 0, f"W={w} must be 8-aligned"
    assert interpret or (cz % 128 == 0 and cout % 128 == 0), (
        f"conv3x3_wgrad_fused: C={cz}/{cout} not 128-aligned — Mosaic "
        "cannot DMA-slice sub-lane-tile channel extents"
    )
    nh = h // tile_h

    vmem = pltpu.VMEM if not interpret else None
    anym = pltpu.ANY if not interpret else None
    in_specs = [pl.BlockSpec(memory_space=anym)] * 3 + [
        pl.BlockSpec(memory_space=vmem)
    ] * 4
    operands = [z, p, comp,
                m.astype(jnp.float32), inv.astype(jnp.float32),
                gm.astype(jnp.float32), gy.astype(jnp.float32)]
    if znorm is not None:
        zm, zi = znorm
        in_specs += [pl.BlockSpec(memory_space=vmem)] * 2
        operands += [zm.astype(jnp.float32), zi.astype(jnp.float32)]

    assert pad in ("reflect", "zero"), pad
    kernel_fn = functools.partial(
        _kernel_wgrad, th=tile_h, w=w, h=h, nh=nh, norm_z=znorm is not None,
        pad=pad, mask_p=mask_p,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * b * h * w * 9 * cz * cout,
            bytes_accessed=(z.size + p.size + comp.size) * z.dtype.itemsize
            + 9 * cz * cout * 4,
            transcendentals=0,
        )
    dk = pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((3, 3 * cz, cout), jnp.float32),
        grid=(b, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, 3 * cz, cout), lambda i, j: (0, 0, 0),
                               memory_space=vmem),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, w, cz), z.dtype),
            pltpu.VMEM((2, tile_h, w, cout), p.dtype),
            pltpu.VMEM((2, tile_h, w, cout), comp.dtype),
            pltpu.VMEM((tile_h + 2, w, 3 * cz), z.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        interpret=interpret,
        **kwargs,
    )(*operands)
    return dk.reshape(3, 3, cz, cout)


def _resblock_bwd_fused(tile_h, interpret, res, g, wgrad_fused: bool = False):
    """Fused-dgrad block backward: 2 Pallas dgrad launches + either 2 XLA
    wgrads (``wgrad_fused=False``) or 2 fused wgrad launches.

    Exactly the math of the XLA ``_resblock_bwd`` (same closed-form IN
    backward, same reflect-pad VJP), with the dgrad side's intermediates
    kept in VMEM. The XLA wgrads reuse ``jax.vjp`` of the pad+conv with
    the input-cotangent discarded — XLA dead-code-eliminates the dgrad
    conv it would otherwise emit, leaving only the weight contraction.
    With ``wgrad_fused`` the dgrad launches stop emitting dy entirely:
    the wgrad launches recompute z and dy on load from the saved raws.
    """
    x, k1, k2, raw1, m1, i1, raw2, m2, i2 = res
    _, h, w, _ = x.shape
    n = h * w
    gf = g.astype(jnp.float32)
    r2 = raw2.astype(jnp.float32)
    # E[g·ŷ2] from raw moments: (E[g·raw2] − m2·E[g])·i2 — one fused
    # reduction pass over (g, raw2) instead of materializing ŷ2.
    gm2 = jnp.mean(gf, axis=(1, 2))
    gy2 = (jnp.mean(gf * r2, axis=(1, 2)) - m2 * gm2) * i2
    dn1, dy2, s = conv3x3_dgrad_fused(
        g, raw2, raw1, k2, m2, i2, gm2, gy2, mask_stats=(m1, i1),
        emit_dy=not wgrad_fused, tile_h=tile_h, interpret=interpret,
    )
    gm1 = s[:, 0] / n
    gy1 = s[:, 1] / n
    dx, dy1 = conv3x3_dgrad_fused(
        dn1, raw1, g, k1, m1, i1, gm1, gy1,
        emit_dy=not wgrad_fused, tile_h=tile_h, interpret=interpret,
    )

    if wgrad_fused:
        dk2 = conv3x3_wgrad_fused(
            raw1, g, raw2, m2, i2, gm2, gy2, znorm=(m1, i1),
            tile_h=tile_h, interpret=interpret,
        )
        dk1 = conv3x3_wgrad_fused(
            x, dn1, raw1, m1, i1, gm1, gy1,
            tile_h=tile_h, interpret=interpret,
        )
        return dx, dk1.astype(k1.dtype), dk2.astype(k2.dtype)

    def pad_conv(z, k):
        return conv2d(reflect_pad2d(z, 1), k, padding="VALID")

    z1 = jnp.maximum(
        (raw1.astype(jnp.float32) - m1[:, None, None, :])
        * i1[:, None, None, :], 0.0
    ).astype(x.dtype)
    _, vjp2 = jax.vjp(pad_conv, z1, k2)
    dk2 = vjp2(dy2)[1]
    _, vjp1 = jax.vjp(pad_conv, x, k1)
    dk1 = vjp1(dy1)[1]
    return dx, dk1.astype(k1.dtype), dk2.astype(k2.dtype)


def _kernel_multi(*refs, th: int, w: int, h: int, nh: int, n_in: int, pad: str):
    """Multi-input zero-SAME (or reflect) fused conv: Σᵢ conv(xᵢ, kᵢ) with
    the IN stats epilogue. The inputs are the legs of a concat conv —
    conv(concat(a, b), K) ≡ conv(a, K[:, :, :Ca]) + conv(b, K[:, :, Ca:]) —
    so the decoder's skip convs fuse without materializing the concat, and
    the down convs (n_in=1, zero-SAME) get their IN reduce for free."""
    x_hbms = refs[:n_in]
    k_refs = refs[n_in : 2 * n_in]
    o_ref, s_ref = refs[2 * n_in], refs[2 * n_in + 1]
    x_vmems = refs[2 * n_in + 2 : 3 * n_in + 2]
    xcats = refs[3 * n_in + 2 : 4 * n_in + 2]
    sems = refs[4 * n_in + 2]

    b, hh, lin, total, slot, nslot = _grid_slots(nh)

    def all_copies(linear, slot_idx):
        bb = jax.lax.div(linear, nh)
        jj = jax.lax.rem(linear, nh)
        out = []
        for i in range(n_in):
            sem_i = sems.at[i]
            for pred, cp in _halo_copy(x_hbms[i], x_vmems[i], sem_i, bb, jj,
                                       slot_idx, th=th, h=h, nh=nh):
                out.append((pred, cp))
        return out

    _dma_prologue(all_copies, lin, total, slot, nslot)

    cout = o_ref.shape[-1]
    acc = jnp.zeros((th, w, cout), jnp.float32)
    for i in range(n_in):
        xv, xcat = x_vmems[i], xcats[i]
        # Halo-row fixups (boundary tiles): reflect copies or zero rows.
        if nh == 1:
            if pad == "reflect":
                xv[slot, 0] = xv[slot, 2]
                xv[slot, th + 1] = xv[slot, th - 1]
            else:
                xv[slot, 0] = jnp.zeros_like(xv[slot, 0])
                xv[slot, th + 1] = jnp.zeros_like(xv[slot, 0])
        else:
            @pl.when(hh == 0)
            def _(xv=xv):
                if pad == "reflect":
                    xv[slot, 0] = xv[slot, 2]
                else:
                    xv[slot, 0] = jnp.zeros_like(xv[slot, 0])

            @pl.when(hh == nh - 1)
            def _(xv=xv):
                if pad == "reflect":
                    xv[slot, th + 1] = xv[slot, th - 1]
                else:
                    xv[slot, th + 1] = jnp.zeros_like(xv[slot, 0])

        xin = xv[slot]
        c = xin.shape[-1]
        xcat[:, :, c : 2 * c] = xin
        xcat[:, 1:, 0:c] = xin[:, : w - 1]
        xcat[:, : w - 1, 2 * c :] = xin[:, 1:]
        if pad == "reflect":
            xcat[:, 0:1, 0:c] = xin[:, 1:2]
            xcat[:, w - 1 : w, 2 * c :] = xin[:, w - 2 : w - 1]
        else:
            xcat[:, 0:1, 0:c] = jnp.zeros_like(xin[:, 0:1])
            xcat[:, w - 1 : w, 2 * c :] = jnp.zeros_like(xin[:, 0:1])
        for dy in range(3):
            acc = acc + jax.lax.dot_general(
                xcat[dy : dy + th],
                k_refs[i][dy],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    o_ref[...] = acc.astype(o_ref.dtype)[None]
    tile = jnp.stack(
        [jnp.sum(acc, axis=(0, 1)), jnp.sum(acc * acc, axis=(0, 1))]
    )[None]

    @pl.when(hh == 0)
    def _():
        s_ref[...] = tile

    @pl.when(hh != 0)
    def _():
        s_ref[...] = s_ref[...] + tile


def conv3x3_sum_fused(
    inputs,
    kernels,
    *,
    pad: str = "zero",
    tile_h: int = 16,
    vmem_limit_mb: int = 110,
    interpret: bool = False,
):
    """SAME 3×3 conv of Σᵢ conv(inputsᵢ, kernelsᵢ) (≡ one conv over their
    channel concat) with halos built in-kernel (``pad`` 'zero' or 'reflect')
    and the instance-norm (mean, inv_std) of the summed output emitted for
    free. Covers the generator's down convs (one input, zero-SAME + IN) and
    decoder skip convs (two inputs, no concat materialization + IN); ref
    `/root/reference/Code/ir_colorization.py:469-482, 503-524`."""
    assert pad in ("zero", "reflect"), pad
    assert len(inputs) == len(kernels) and inputs
    b, h, w, _ = inputs[0].shape
    cout = kernels[0].shape[-1]
    for x, k in zip(inputs, kernels):
        assert x.shape[:3] == (b, h, w), (x.shape, (b, h, w))
        assert k.shape == (3, 3, x.shape[-1], cout), (k.shape, x.shape)
        # Mosaic constraint (measured, r3): the manual halo DMA slices the
        # HBM memref along batch/H, and Mosaic requires every slice of a
        # lane-tiled memref to span full 128-lane tiles — a C=64 input is
        # tile-padded to 128 in HBM, so its logical 64-channel extent is a
        # misaligned slice ("Slice shape along dimension 3 must be aligned
        # to tiling (128), but is 64"). C<128 legs (down1's x0, up2's skip)
        # must stay on the XLA path.
        assert interpret or x.shape[-1] % 128 == 0, (
            f"conv3x3_sum_fused: input C={x.shape[-1]} not 128-aligned — "
            "Mosaic cannot DMA-slice sub-lane-tile channel extents"
        )
    assert h % tile_h == 0, f"H={h} must divide tile_h={tile_h}"
    assert w % 8 == 0, f"W={w} must be 8-aligned"
    nh = h // tile_h
    n_in = len(inputs)

    kpacked = [k.reshape(3, 3 * k.shape[2], cout) for k in kernels]
    vmem = pltpu.VMEM if not interpret else None
    anym = pltpu.ANY if not interpret else None
    kernel_fn = functools.partial(
        _kernel_multi, th=tile_h, w=w, h=h, nh=nh, n_in=n_in, pad=pad
    )
    kwargs = {}
    if not interpret:
        flops = sum(2 * b * h * w * 9 * x.shape[-1] * cout for x in inputs)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=flops,
            bytes_accessed=(sum(x.size for x in inputs) + b * h * w * cout)
            * inputs[0].dtype.itemsize,
            transcendentals=0,
        )
    out, stats = pl.pallas_call(
        kernel_fn,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, cout), inputs[0].dtype),
            jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
        ),
        grid=(b, nh),
        in_specs=[pl.BlockSpec(memory_space=anym)] * n_in
        + [pl.BlockSpec(memory_space=vmem)] * n_in,
        out_specs=(
            pl.BlockSpec((1, tile_h, w, cout), lambda i, j: (i, j, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 2, cout), lambda i, j: (i, 0, 0),
                         memory_space=vmem),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, w, x.shape[-1]), x.dtype) for x in inputs
        ] + [
            pltpu.VMEM((tile_h + 2, w, 3 * x.shape[-1]), x.dtype) for x in inputs
        ] + [
            pltpu.SemaphoreType.DMA((n_in, 2)),
        ],
        interpret=interpret,
        **kwargs,
    )(*inputs, *kpacked)
    n = h * w
    mean_out = stats[:, 0] / n
    var = stats[:, 1] / n - mean_out * mean_out
    inv_out = jax.lax.rsqrt(var + _EPS)
    return out, mean_out, inv_out


# ---------------------------------------------------------------------------
# int8 fused variant (opt-in serving mode): same one-read/one-write schedule,
# but the three dx-concat contractions run on the MXU's 2× int8 path.
# ---------------------------------------------------------------------------

# Fixed post-IN quantization clip: conv2's input is instance-normalized
# (unit variance) and ReLU'd, so clipping at 6σ loses essentially nothing
# and a FIXED scale avoids any cross-tile amax dependency in-kernel.
_QCLIP = 6.0


def _kernel_q(
    x_hbm, k_ref, *rest, th: int, w: int, h: int, nh: int, norm_in: bool,
    halo: str = "reflect",
):
    """int8 twin of ``_kernel``: HBM stays bf16 (identical DMA + traffic);
    the VMEM tile is quantized on load — conv1 by the per-sample dynamic
    scale ``q_ref`` (=127/amax), conv2 by normalize→ReLU→fixed 127/6σ —
    and the three dx matmuls contract int8×int8→int32. The (B, Cout) f32
    ``sc_ref`` (= s_in·s_w[co]) dequantizes the accumulator in the epilogue;
    output tile + Σy/Σy² stats are bit-identical in structure to the float
    kernel's, so IN₂ absorbs the scales exactly (ops/quant.py docstring).
    """
    i = 0
    m_ref = i_ref = q_ref = top_hbm = bot_hbm = None
    if norm_in:
        m_ref, i_ref = rest[0], rest[1]
        i = 2
    else:
        q_ref = rest[0]
        i = 1
    sc_ref = rest[i]
    i += 1
    if halo == "separate":
        top_hbm, bot_hbm = rest[i], rest[i + 1]
        i += 2
    o_ref, s_ref, x_vmem, xcat, sems = rest[i:]

    b, hh, lin, total, slot, nslot = _grid_slots(nh)

    def all_copies(linear, slot_idx):
        bb = jax.lax.div(linear, nh)
        jj = jax.lax.rem(linear, nh)
        return _halo_copy(x_hbm, x_vmem, sems, bb, jj, slot_idx,
                          th=th, h=h, nh=nh, halo=halo,
                          top_hbm=top_hbm, bot_hbm=bot_hbm)

    _dma_prologue(all_copies, lin, total, slot, nslot)

    if halo in ("provided", "separate"):
        pass
    elif nh == 1:
        x_vmem[slot, 0] = x_vmem[slot, 2]
        x_vmem[slot, th + 1] = x_vmem[slot, th - 1]
    else:
        @pl.when(hh == 0)
        def _():
            x_vmem[slot, 0] = x_vmem[slot, 2]

        @pl.when(hh == nh - 1)
        def _():
            x_vmem[slot, th + 1] = x_vmem[slot, th - 1]

    xin = x_vmem[slot].astype(jnp.float32)
    c = xin.shape[-1]
    if norm_in:
        mean = m_ref[b]
        inv = i_ref[b]
        xin = jnp.maximum(
            (xin - mean[None, None, :]) * inv[None, None, :], 0.0
        )
        xq = jnp.minimum(jnp.round(xin * (127.0 / _QCLIP)), 127.0)
    else:
        xq = jnp.clip(jnp.round(xin * q_ref[b]), -127.0, 127.0)
    xq = xq.astype(jnp.int8)

    xcat[:, :, c : 2 * c] = xq
    xcat[:, 1:, 0:c] = xq[:, : w - 1]
    xcat[:, 0:1, 0:c] = xq[:, 1:2]
    xcat[:, : w - 1, 2 * c :] = xq[:, 1:]
    xcat[:, w - 1 : w, 2 * c :] = xq[:, w - 2 : w - 1]

    cout = o_ref.shape[-1]
    acc = jnp.zeros((th, w, cout), jnp.int32)
    for dy in range(3):
        acc = acc + jax.lax.dot_general(
            xcat[dy : dy + th],
            k_ref[dy],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    accf = acc.astype(jnp.float32) * sc_ref[b][None, None, :]
    o_ref[...] = accf.astype(o_ref.dtype)[None]

    tile = jnp.stack(
        [jnp.sum(accf, axis=(0, 1)), jnp.sum(accf * accf, axis=(0, 1))]
    )[None]

    @pl.when(hh == 0)
    def _():
        s_ref[...] = tile

    @pl.when(hh != 0)
    def _():
        s_ref[...] = s_ref[...] + tile


def conv3x3_reflect_fused_q(
    x: jnp.ndarray,
    kq: jnp.ndarray,
    sc: jnp.ndarray,
    *,
    qscale: jnp.ndarray | None = None,
    mean: jnp.ndarray | None = None,
    inv: jnp.ndarray | None = None,
    tile_h: int = 16,
    vmem_limit_mb: int = 100,
    halo: str = "reflect",
    halo_rows: tuple | None = None,
    stats_axis: str | None = None,
    interpret: bool = False,
):
    """int8-MXU reflect-padded 3×3 conv of float ``x`` (B, H, W, C).

    ``kq``: (3, 3, C, Cout) int8 per-output-channel quantized weights.
    ``sc``: (B, Cout) f32 output dequant scale = s_in · s_w[co].
    Exactly one of:
    * ``qscale`` (B,) f32 = 127/amax(|x|) per sample — conv1: quantize the
      raw input on load;
    * ``mean``/``inv`` (B, C) — conv2: IN-normalize + ReLU on load, then
      quantize by the fixed 127/6σ scale (``sc`` must carry 6/127·s_w).
    Returns (y float, IN mean, IN inv_std of y) like conv3x3_reflect_fused.
    ``halo``/``halo_rows``/``stats_axis``: same spatial-sharding contracts
    as ``conv3x3_reflect_fused`` (slab input / 1-row halo operands /
    psum'd IN stats).
    """
    assert halo in ("reflect", "provided", "separate"), halo
    assert (halo_rows is not None) == (halo == "separate"), halo
    b, h, w, c = x.shape
    if halo == "provided":
        h -= 2
    cout = kq.shape[-1]
    assert kq.dtype == jnp.int8 and kq.shape[:3] == (3, 3, c), kq.shape
    assert sc.shape == (b, cout), sc.shape
    norm_in = mean is not None
    assert norm_in != (qscale is not None), "need exactly one of qscale / stats"
    assert h % tile_h == 0, f"H={h} must divide tile_h={tile_h}"
    assert w % 8 == 0, f"W={w} must be 8-aligned"
    assert interpret or c % 128 == 0, (
        f"conv3x3_reflect_fused_q: input C={c} not 128-aligned for halo DMA"
    )
    nh = h // tile_h

    kpacked = kq.reshape(3, 3 * c, cout)

    vmem = pltpu.VMEM if not interpret else None
    anym = pltpu.ANY if not interpret else None
    in_specs = [pl.BlockSpec(memory_space=anym), pl.BlockSpec(memory_space=vmem)]
    operands = [x, kpacked]
    stat_spec = pl.BlockSpec(memory_space=vmem)
    if norm_in:
        in_specs += [stat_spec, stat_spec]
        operands += [mean.astype(jnp.float32), inv.astype(jnp.float32)]
    else:
        # (B,) per-sample scale: a 1-D VMEM ref puts B in the LANE dim, and
        # Mosaic rejects dynamic lane-indexed scalar loads ("index in
        # dimension 0 is a multiple of 128", r3c run). SMEM is the canonical
        # home for dynamically-indexed scalars. (The 2-D (B, C) stat refs
        # are fine in VMEM: their dynamic index lands on sublanes.)
        smem = pltpu.SMEM if not interpret else None
        in_specs += [pl.BlockSpec(memory_space=smem)]
        operands += [qscale.astype(jnp.float32)]
    in_specs += [stat_spec]
    operands += [sc.astype(jnp.float32)]
    if halo == "separate":
        top, bot = halo_rows
        assert top.shape == bot.shape == (b, 1, w, c), (top.shape, x.shape)
        in_specs += [pl.BlockSpec(memory_space=anym)] * 2
        operands += [top.astype(x.dtype), bot.astype(x.dtype)]

    kernel_fn = functools.partial(
        _kernel_q, th=tile_h, w=w, h=h, nh=nh, norm_in=norm_in, halo=halo
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * b * h * w * 9 * c * cout,
            bytes_accessed=(x.size + b * h * w * cout) * x.dtype.itemsize,
            transcendentals=0,
        )
    out, stats = pl.pallas_call(
        kernel_fn,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
            jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
        ),
        grid=(b, nh),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, tile_h, w, cout), lambda i, j: (i, j, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 2, cout), lambda i, j: (i, 0, 0),
                         memory_space=vmem),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, w, c), x.dtype),
            pltpu.VMEM((tile_h + 2, w, 3 * c), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        **kwargs,
    )(*operands)
    n = h * w
    if stats_axis is not None:
        stats = jax.lax.psum(stats, stats_axis)
        n *= jax.lax.axis_size(stats_axis)
    mean_out = stats[:, 0] / n
    var = stats[:, 1] / n - mean_out * mean_out
    inv_out = jax.lax.rsqrt(var + _EPS)
    return out, mean_out, inv_out


def resnet_block_pallas_q(
    x: jnp.ndarray,
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    *,
    tile_h: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8-MXU ResnetBlock (inference-only — round-to-nearest has zero
    gradient, same stance as ops/quant.py): the fused-block schedule of
    ``resnet_block_pallas`` with both convs on the int8 path. HBM traffic
    is identical (bf16 tensors); only the matmul floor halves. Scales are
    absorbed exactly by the INs each conv feeds; the only added error is
    int8 rounding on activations/weights (ref semantics
    `/root/reference/Code/ir_colorization.py:362-418`).
    """
    from ircolor_tpu.ops.quant import _AMAX_FLOOR, quantize_weight_per_channel

    b = x.shape[0]
    kq1, sw1 = quantize_weight_per_channel(k1)
    kq2, sw2 = quantize_weight_per_channel(k2)
    # Per-sample dynamic range of the raw block input (XLA fuses the amax
    # into the producer's elementwise epilogue).
    amax = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3)), _AMAX_FLOOR
    )
    qs = 127.0 / amax
    sc1 = (amax / 127.0)[:, None] * sw1[None, :]
    raw1, m1, i1 = conv3x3_reflect_fused_q(
        x, kq1, sc1, qscale=qs, tile_h=tile_h, interpret=interpret
    )
    sc2 = jnp.broadcast_to((_QCLIP / 127.0) * sw2[None, :], (b, k2.shape[-1]))
    raw2, m2, i2 = conv3x3_reflect_fused_q(
        raw1, kq2, sc2, mean=m1, inv=i1, tile_h=tile_h, interpret=interpret
    )
    y = (raw2.astype(jnp.float32) - m2[:, None, None, :]) * i2[:, None, None, :]
    return x + y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Spatial-sharding (H-axis shard_map) wrappers: the fused kernels compose
# with image-parallel inference. Each per-shard kernel launch consumes a
# CALLER-PROVIDED halo slab (halo="provided") whose edge rows were
# ppermuted in from the neighbor shards over ICI, and the IN moments are
# psum'd to cover the global image — bit-compatible (up to f32 reduction
# order) with the single-device fused block. Inference-only, like every
# manual-DMA path here (parallel/spatial.py wires it for `test
# --sp-devices N`).
# ---------------------------------------------------------------------------


def _exchange_halo_rows(x: jnp.ndarray, axis: str) -> tuple:
    """(B, Hloc, W, C) per-shard tensor → its two (B, 1, W, C) halo rows,
    inside a ``shard_map`` over named H-shard axis ``axis``.

    Interior halo rows come from the neighbor shards (two ``ppermute``
    shifts); the global boundary shards reflect locally, which IS the global
    ReflectionPad2d(1) row (global row −1 ≡ global row 1 = shard 0's local
    row 1, and symmetrically at the bottom). The rows feed the kernel's
    ``halo="separate"`` input DMA — the activation itself is never copied
    (no slab materialization)."""
    size = jax.lax.axis_size(axis)
    if size == 1:
        return x[:, 1:2], x[:, -2:-1]
    idx = jax.lax.axis_index(axis)
    down = [(i, i + 1) for i in range(size - 1)]  # my last row → next shard
    up = [(i + 1, i) for i in range(size - 1)]    # my first row → prev shard
    top = jax.lax.ppermute(x[:, -1:], axis, down)
    bot = jax.lax.ppermute(x[:, 0:1], axis, up)
    top = jnp.where(idx == 0, x[:, 1:2], top)
    bot = jnp.where(idx == size - 1, x[:, -2:-1], bot)
    return top, bot


def resnet_block_pallas_spatial(
    x: jnp.ndarray,
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    *,
    axis: str,
    tile_h: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """``resnet_block_pallas`` for an H-sharded ``x``, called INSIDE a
    ``shard_map`` over named axis ``axis`` (the generator's spatial_mesh
    wiring builds this). Halo rows ride two 1-row ppermutes per conv into
    the kernel's ``halo="separate"`` edge DMAs; IN stats psum once per
    conv. Inference-only (no custom_vjp: spatial sharding is the serving
    layout; training is DP)."""
    raw1, m1, i1 = conv3x3_reflect_fused(
        x, k1, tile_h=tile_h, halo="separate",
        halo_rows=_exchange_halo_rows(x, axis), stats_axis=axis,
        interpret=interpret,
    )
    raw2, m2, i2 = conv3x3_reflect_fused(
        raw1, k2, m1, i1, tile_h=tile_h, halo="separate",
        halo_rows=_exchange_halo_rows(raw1, axis), stats_axis=axis,
        interpret=interpret,
    )
    y = (raw2.astype(jnp.float32) - m2[:, None, None, :]) * i2[:, None, None, :]
    return x + y.astype(x.dtype)


def resnet_block_pallas_q_spatial(
    x: jnp.ndarray,
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    *,
    axis: str,
    tile_h: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8 twin of ``resnet_block_pallas_spatial``: per-sample activation
    amax is pmax'd over the shard axis so the quant scale matches the
    single-device ``resnet_block_pallas_q`` exactly (same scale ⇒ same int8
    grid; the only cross-shard float is the psum'd IN stats)."""
    from ircolor_tpu.ops.quant import _AMAX_FLOOR, quantize_weight_per_channel

    b = x.shape[0]
    kq1, sw1 = quantize_weight_per_channel(k1)
    kq2, sw2 = quantize_weight_per_channel(k2)
    amax = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3)), _AMAX_FLOOR
    )
    amax = jax.lax.pmax(amax, axis)
    qs = 127.0 / amax
    sc1 = (amax / 127.0)[:, None] * sw1[None, :]
    raw1, m1, i1 = conv3x3_reflect_fused_q(
        x, kq1, sc1, qscale=qs, tile_h=tile_h, halo="separate",
        halo_rows=_exchange_halo_rows(x, axis), stats_axis=axis,
        interpret=interpret,
    )
    sc2 = jnp.broadcast_to((_QCLIP / 127.0) * sw2[None, :], (b, k2.shape[-1]))
    raw2, m2, i2 = conv3x3_reflect_fused_q(
        raw1, kq2, sc2, mean=m1, inv=i1, tile_h=tile_h, halo="separate",
        halo_rows=_exchange_halo_rows(raw1, axis), stats_axis=axis,
        interpret=interpret,
    )
    y = (raw2.astype(jnp.float32) - m2[:, None, None, :]) * i2[:, None, None, :]
    return x + y.astype(x.dtype)

"""Fused 7×7 output-head kernel: the generator's outc stage in one HBM read.

The reference's output head (`/root/reference/Code/ir_colorization.py:527-531`:
InstanceNorm → ReLU → ReflectionPad2d(3) → Conv2d 7×7 ngf→3 → tanh) costs the
XLA path three materialized passes at 16×512×640: the IN-normalize+ReLU write,
the (B, H+6, W+6, 64) reflect-pad copy, and the layout transform feeding the
lane-packed conv (docs/PERF.md round-3 knockouts: −7.1 ms with the head pads
knocked out, almost all outc's). This kernel collapses the whole segment into
ONE read of the raw up2-conv output + one packed write:

* **Group-packed input layout**: the (B, H, W, C) input is reshaped XLA-side
  to (B, H, W/32, 32·C) — 32 horizontally-adjacent pixels share a lane
  group. One relayout pass (~0.13 ms at 42 MB vs the chip's ~670 GB/s),
  and the lane extent (2048 at C=64) satisfies Mosaic's halo-DMA rule that
  every sliced memref dimension spans whole 128-lane tiles — this is what
  unlocks a C=64 input that plain (B, H, W, 64) layout cannot DMA
  (docs/PERF.md: conv3x3_sum_fused / border-fold nulls).
* **Normalize+ReLU on load**: the previous IN's (mean, inv) — stats by one
  XLA reduce pass, no write — are applied to the VMEM-resident tile, so the
  normalize never touches HBM. Per-channel affine + ReLU commute with
  reflect padding, so normalizing raw halo rows is exact.
* **Reflect halos in-kernel**: H-axis by clamped boundary DMAs + 3-row VMEM
  fixups (rows −k ≡ k, H−1+k ≡ H−1−k); W-axis by lane-slice edge vectors
  (pixels −k ≡ k, W−1+k ≡ W−1−k) concatenated onto the shifted group
  windows. No padded tensor ever exists.
* **Output lane-packing in the matmul**: each output block column is
  (offset∈0..31, co) — the p=32 packing that made the XLA lane-packed head
  win (ops/conv.py:conv2d_lanepack) is here just the shape of the weight
  matrix: N = 32·cout = 96 of 128 lanes vs 3 for a naive Cout=3 conv. The
  7×7 window of a 32-pixel output group spans 38 input pixels = the group
  itself plus 4 boundary pixels from each neighbor, so each dy row is three
  aligned matmuls: neighbor-left (4C contraction), own group (32C), and
  neighbor-right (4C). Weights multiplying out-of-window taps are
  structural zeros — the math is exact (reassociation aside).

Compute floor at 16×512×640×64→3: 7·(2·(32+4+4)·64·96) FLOP per output
pixel-group element ⇒ 0.56 TFLOP ≈ 3.8 ms at the v5e MXU's measured
197 TF/s × 96/128 lane fill — against ~8 ms for the shipped XLA segment
(6.4 ms lane-packed conv + pad/normalize passes).

Status: parity-tested in interpret mode (tests/test_pallas_head.py); TPU
ship decision in docs/PERF.md. Differentiable via ``outc_head`` (custom_vjp
with the same saved-stats backward shape as the fused resblock).
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

_KS = 7  # kernel size (pad 3)
# Fixed activation quantization clip for the int8 head: post-IN+ReLU inputs
# are bounded ≈[0, 6σ]. MUST match ops/pallas_resblock._QCLIP (the fused
# block's conv2 leg uses the identical fixed-scale scheme).
_QCLIP = 6.0
# Candidate output-pixels-per-lane-group widths, best MXU N-fill first.
# Mosaic constrains BOTH tiled dims of the group-packed (B, H, W/p, p·C)
# memref: lane extent p·C % 128 == 0 AND sublane extent (W/p) % 8 == 0 —
# the first serial run failed remote compile at W=640/p=32 (WG=20, "Slice
# shape along dimension 2 must be aligned to tiling (8), but is 20").
# p=40 fits 640 exactly (WG=16, N=120/128 lanes); p=32 fits 256 (WG=8).
_PACKS = (40, 32, 16, 8)


def _pick_pack(w: int, c: int, cout: int) -> int | None:
    for p in _PACKS:
        if w % p == 0 and (w // p) % 8 == 0 and (p * c) % 128 == 0:
            return p
    return None


def _pack_head_kernels(k7: jnp.ndarray, p: int):
    """(7, 7, C, cout) → (Ka, Kb, Kc) dense lane-packed weight matrices.

    Kd[dy, m·C+ci, off·cout+co] = k7[dy, m−off−1, ci, co] (zero outside
    0 ≤ m−off−1 < 7), where window slot m holds input pixel p·g+m−4 and
    off is the output pixel within group g. Ka = the 4 left-neighbor slots
    (m 0..3), Kb = the group's own p (m 4..p+3), Kc = the 4 right-neighbor
    slots (m p+4..p+7).
    """
    ks, _, c, cout = k7.shape
    assert ks == _KS, k7.shape
    win = p + _KS + 1  # window pixel slots m per group (m = pixel+4)
    cols = [
        jnp.pad(k7, ((0, 0), (off + 1, win - _KS - (off + 1)), (0, 0), (0, 0)))
        for off in range(p)
    ]
    kd = jnp.stack(cols, axis=3)  # (7, p+8, C, p, cout)
    kd = kd.reshape(_KS, win * c, p * cout)
    return kd[:, : 4 * c], kd[:, 4 * c : (p + 4) * c], kd[:, (p + 4) * c :]


def _halo3_copies(x_hbm, x_vmem, sems, bb, hh, slot, *, th: int, h: int, nh: int):
    """Branch-static 3-row-halo DMA descriptors for H-tile ``hh`` (cf.
    pallas_resblock._halo_copy, which is the 1-row version)."""
    if nh == 1:
        return [(None, pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(0, h)], x_vmem.at[slot, pl.ds(3, h)],
            sems.at[slot],
        ))]
    first = pltpu.make_async_copy(
        x_hbm.at[bb, pl.ds(0, th + 3)],
        x_vmem.at[slot, pl.ds(3, th + 3)],
        sems.at[slot],
    )
    last = pltpu.make_async_copy(
        x_hbm.at[bb, pl.ds(h - th - 3, th + 3)],
        x_vmem.at[slot, pl.ds(0, th + 3)],
        sems.at[slot],
    )
    mid = pltpu.make_async_copy(
        x_hbm.at[bb, pl.ds(hh * th - 3, th + 6)],
        x_vmem.at[slot],
        sems.at[slot],
    )
    return [(hh == 0, first), (hh == nh - 1, last),
            (jnp.logical_and(hh != 0, hh != nh - 1), mid)]


def _kernel_head(
    x_hbm, ka_ref, kb_ref, kc_ref, m_ref, i_ref, *rest,
    th: int, h: int, nh: int, c: int, p: int, quant: bool = False,
):
    if quant:
        # int8 twin (same pattern as pallas_resblock._kernel_q): the
        # normalized+ReLU'd tile is quantized in-VMEM by the fixed 127/6σ
        # scale (post-IN+ReLU values are bounded ≈[0, 6σ] — identical
        # assumption to the fused block's conv2 leg), the three window
        # matmuls contract int8×int8→int32 on the MXU's 2× path, and the
        # (p·cout,) f32 ``sc_ref`` (= 6σ/127 · s_w[co], off-tiled)
        # dequantizes the accumulator in the epilogue. HBM traffic and DMA
        # structure are identical to the float kernel.
        sc_ref, o_ref, x_vmem, sems = rest
    else:
        sc_ref = None
        o_ref, x_vmem, sems = rest
    b = pl.program_id(0)
    hh = pl.program_id(1)
    lin = b * nh + hh
    total = pl.num_programs(0) * nh
    slot = jax.lax.rem(lin, 2)
    nslot = jax.lax.rem(lin + 1, 2)

    def run(linear, slot_idx, action):
        bb = jax.lax.div(linear, nh)
        jj = jax.lax.rem(linear, nh)
        for pred, cp in _halo3_copies(x_hbm, x_vmem, sems, bb, jj, slot_idx,
                                      th=th, h=h, nh=nh):
            if pred is None:
                getattr(cp, action)()
            else:
                @pl.when(pred)
                def _(cp=cp):
                    getattr(cp, action)()

    @pl.when(lin == 0)
    def _():
        run(lin, slot, "start")

    @pl.when(lin + 1 < total)
    def _():
        run(lin + 1, nslot, "start")

    run(lin, slot, "wait")

    # H-axis reflect fixups: slot s holds input row (tile_start − 3 + s),
    # so rows −1..−3 land in slots 2..0 and H..H+2 in slots th+3..th+5.
    def fix_top():
        x_vmem[slot, 2] = x_vmem[slot, 4]
        x_vmem[slot, 1] = x_vmem[slot, 5]
        x_vmem[slot, 0] = x_vmem[slot, 6]

    def fix_bottom():
        x_vmem[slot, th + 3] = x_vmem[slot, th + 1]
        x_vmem[slot, th + 4] = x_vmem[slot, th]
        x_vmem[slot, th + 5] = x_vmem[slot, th - 1]

    if nh == 1:
        fix_top()
        fix_bottom()
    else:
        @pl.when(hh == 0)
        def _():
            fix_top()

        @pl.when(hh == nh - 1)
        def _():
            fix_bottom()

    # Normalize + ReLU on load (mean/inv are lane-tiled to p·C XLA-side).
    mean = m_ref[b]
    inv = i_ref[b]
    xn = x_vmem[slot].astype(jnp.float32)  # (th+6, WG, p·C)
    xn = jnp.maximum((xn - mean[None, None, :]) * inv[None, None, :], 0.0)
    if quant:
        # Post-IN+ReLU values are bounded ≈[0, 6σ]: the fixed 127/6σ scale
        # needs no amax pass (no low clip — xn ≥ 0 after the ReLU).
        xn = jnp.minimum(jnp.round(xn * (127.0 / _QCLIP)), 127.0).astype(jnp.int8)
        acc_t = jnp.int32
    else:
        xn = xn.astype(x_vmem.dtype)
        acc_t = jnp.float32

    wg = xn.shape[1]
    nout = o_ref.shape[-1]
    acc = jnp.zeros((th, wg, nout), acc_t)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    )
    for dy in range(_KS):
        xm = xn[dy : dy + th]  # (th, WG, p·C)
        acc = acc + dot(xm, kb_ref[dy])
        # Left-neighbor window slots (m 0..3 = pixels p·g−4..p·g−1): the
        # previous group's last 4 pixels; group 0 takes the W-reflect
        # pixels 4, 3, 2, 1 (x[−k] ≡ x[k]; m=0 multiplies zero weights).
        ledge = jnp.concatenate(
            [xm[:, 0, 4 * c : 5 * c], xm[:, 0, 3 * c : 4 * c],
             xm[:, 0, 2 * c : 3 * c], xm[:, 0, 1 * c : 2 * c]], axis=-1,
        )
        xl = jnp.concatenate(
            [ledge[:, None], xm[:, :-1, (p - 4) * c :]], axis=1
        )
        acc = acc + dot(xl, ka_ref[dy])
        # Right-neighbor slots (m p+4..p+7 = pixels p·g+p..p+3): the next
        # group's first 4; the last group takes reflect pixels W−2..W−5
        # (x[W−1+k] ≡ x[W−1−k]; m=p+7 multiplies zero weights).
        # NOTE: a NEGATIVE integer index (xm[:, -1]) routes through
        # dynamic_slice, which Mosaic cannot lower; the positive static
        # index takes the lax.slice path and lowers fine.
        lg = xm.shape[1] - 1
        redge = jnp.concatenate(
            [xm[:, lg, (p - 2) * c : (p - 1) * c],
             xm[:, lg, (p - 3) * c : (p - 2) * c],
             xm[:, lg, (p - 4) * c : (p - 3) * c],
             xm[:, lg, (p - 5) * c : (p - 4) * c]], axis=-1,
        )
        xr = jnp.concatenate([xm[:, 1:, : 4 * c], redge[:, None]], axis=1)
        acc = acc + dot(xr, kc_ref[dy])
    if quant:
        acc = acc.astype(jnp.float32) * sc_ref[...][None, None, :]
    o_ref[...] = acc.astype(o_ref.dtype)[None]


def _pick_tile(h: int, wg: int, c: int, p: int, limit: int) -> int | None:
    """Largest H-tile whose double-buffered bf16 scratch + the ~3 f32 tile
    temporaries (normalize intermediates; Mosaic's OOM accounting includes
    them) fit the scoped VMEM cap."""
    for th in (32, 16, 8, 4):
        if h % th != 0 or th > h:
            continue
        scratch = 2 * (th + 6) * wg * p * c * 2
        temps = 3 * (th + 6) * wg * p * c * 4
        if scratch + temps > int(limit * 0.75):
            continue
        return th
    return None


def head_supported(shape: tuple[int, ...], vmem_limit_mb: int = 96) -> bool:
    """Shapes ``conv7x7_head_pallas`` can run on real TPU: a group pack p
    with W % p == 0, (W/p) % 8 == 0 (Mosaic sublane tiling of the packed
    memref) and p·C % 128 == 0 (lane tiling), H ≥ 8 (reflect sources inside
    one tile) with a valid H-tile."""
    _, h, w, c = shape
    p = _pick_pack(w, c, 3)
    return (
        p is not None
        and h >= 8
        and _pick_tile(h, w // p, c, p, vmem_limit_mb * 1024 * 1024) is not None
    )


def conv7x7_head_pallas(
    x: jnp.ndarray,
    mean: jnp.ndarray,
    inv: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    tile_h: int | None = None,
    pack: int | None = None,
    vmem_limit_mb: int = 96,
    quant: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B,H,W,C) RAW conv output + per-(B,C) IN ``(mean, inv_std)`` +
    (7,7,C,cout) weights → ``conv7×7_reflect3(relu((x−mean)·inv))``,
    (B,H,W,cout). No bias/tanh — the caller fuses those into its epilogue.

    ``quant=True`` runs the int8 serving form: weights per-output-channel
    int8 (quantized here), activations quantized in-VMEM after the
    normalize+ReLU by the fixed 127/6σ scale, matmuls int8×int8→int32 on
    the MXU's 2× path, dequantized in the epilogue (ops/quant.py scheme —
    error is int8 rounding noise only; no scale reaches the output since
    the dequant is exact).
    """
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    assert kernel.shape == (_KS, _KS, c, cout), (kernel.shape, x.shape)
    assert h >= 8, f"H={h} too small for 3-row reflect halos"
    assert mean.shape == (b, c) and inv.shape == (b, c), (mean.shape, inv.shape)
    p = pack or _pick_pack(w, c, cout)
    if p is None and interpret:  # parity tests only need W % p == 0
        p = next((q for q in _PACKS if w % q == 0), None)
    assert p is not None and w % p == 0, (
        f"conv7x7_head_pallas: no group pack fits W={w}, C={c} "
        f"(need W%p==0, (W/p)%8==0, p·C%128==0 for p in {_PACKS})"
    )
    assert p >= 8, p  # ledge/redge draw 4+1 pixels from a single group
    wg = w // p
    th = tile_h or _pick_tile(h, wg, c, p, vmem_limit_mb * 1024 * 1024)
    assert th is not None and h % th == 0, (x.shape, th)
    nh = h // th

    xg = x.reshape(b, h, wg, p * c)  # one XLA relayout pass
    if quant:
        from ircolor_tpu.ops.quant import quantize_weight_per_channel

        kq, sw = quantize_weight_per_channel(kernel)  # int8, f32 (cout,)
        ka, kb, kc = _pack_head_kernels(kq, p)
        # Output column (off·cout + co) dequantizes by 6σ/127 · s_w[co]:
        # tile matches the off-major packed column order.
        sc = jnp.tile(sw * (_QCLIP / 127.0), p)
    else:
        ka, kb, kc = _pack_head_kernels(kernel.astype(x.dtype), p)
        sc = None
    m32 = jnp.tile(mean.astype(jnp.float32), (1, p))
    i32 = jnp.tile(inv.astype(jnp.float32), (1, p))

    vmem = pltpu.VMEM if (_HAVE_PLTPU and not interpret) else None
    anym = pltpu.ANY if (_HAVE_PLTPU and not interpret) else None
    kwargs = {}
    if not interpret and _HAVE_PLTPU:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * b * h * w * _KS * _KS * c * cout,
            bytes_accessed=(x.size + b * h * w * cout) * x.dtype.itemsize,
            transcendentals=0,
        )
    in_specs = [
        pl.BlockSpec(memory_space=anym),
        pl.BlockSpec(memory_space=vmem),
        pl.BlockSpec(memory_space=vmem),
        pl.BlockSpec(memory_space=vmem),
        pl.BlockSpec(memory_space=vmem),
        pl.BlockSpec(memory_space=vmem),
    ]
    operands = [xg, ka, kb, kc, m32, i32]
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=vmem))
        operands.append(sc.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(
            _kernel_head, th=th, h=h, nh=nh, c=c, p=p, quant=quant
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wg, p * cout), x.dtype),
        grid=(b, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th, wg, p * cout), lambda i, j: (i, j, 0, 0),
            memory_space=vmem,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 6, wg, p * c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        **kwargs,
    )(*operands)
    return out.reshape(b, h, w, cout)


def outc_head(
    x: jnp.ndarray, kernel: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """Differentiable fused output head: ``conv7×7_reflect3(relu(IN(x)))``
    with the normalize-on-load Pallas kernel as the forward (IN stats by one
    XLA reduce; no bias — add it outside, it autodiffs trivially).

    The manual-DMA kernel has no autodiff rule, so the backward is
    hand-assembled XLA math over the saved raw input + IN stats (the
    resnet_block_pallas custom_vjp shape): recompute ŷ = (x−μ)·inv
    elementwise, push the cotangent through jax.vjp of the reflect-pad 7×7
    conv (one dgrad + one wgrad conv), mask by ReLU, and apply the
    closed-form instance-norm backward.
    """
    return _head_vjp(interpret, x, kernel)


def _head_primal(interpret, x, kernel):
    from ircolor_tpu.ops.norm import instance_norm_stats

    mean, inv = instance_norm_stats(x)
    return conv7x7_head_pallas(x, mean, inv, kernel, interpret=interpret), (mean, inv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _head_vjp(interpret, x, kernel):
    return _head_primal(interpret, x, kernel)[0]


def _head_fwd(interpret, x, kernel):
    out, (mean, inv) = _head_primal(interpret, x, kernel)
    return out, (x, kernel, mean, inv)


def _head_bwd(interpret, res, g):
    from ircolor_tpu.ops.conv import conv2d
    from ircolor_tpu.ops.padding import reflect_pad2d
    from ircolor_tpu.ops.pallas_resblock import _in_bwd

    x, kernel, mean, inv = res
    yhat = (x.astype(jnp.float32) - mean[:, None, None, :]) * inv[:, None, None, :]
    z = jnp.maximum(yhat, 0.0).astype(x.dtype)

    def pad_conv(z_, k_):
        return conv2d(reflect_pad2d(z_, 3), k_, padding="VALID")

    # jax.vjp's primal output is unused → XLA DCEs the forward conv; only
    # the dgrad/wgrad convs remain.
    _, vjp = jax.vjp(pad_conv, z, kernel)
    dz, dk = vjp(g)
    dn = dz.astype(jnp.float32) * (yhat > 0)
    dx = _in_bwd(dn, yhat, inv).astype(x.dtype)
    return dx, dk.astype(kernel.dtype)


_head_vjp.defvjp(_head_fwd, _head_bwd)


def outc_head_q(
    x: jnp.ndarray, kernel: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """int8 serving form of ``outc_head`` (inference-only — round-to-nearest
    has zero gradient, same stance as ops/quant.py): identical schedule and
    HBM traffic, matmuls on the MXU's int8 2× path, fixed 127/6σ activation
    scale after the in-kernel normalize+ReLU, per-output-channel weight
    scales dequantized exactly in the epilogue. Ref semantics
    `/root/reference/Code/ir_colorization.py:527-531`.
    """
    from ircolor_tpu.ops.norm import instance_norm_stats

    mean, inv = instance_norm_stats(x)
    return conv7x7_head_pallas(
        x, mean, inv, kernel, quant=True, interpret=interpret
    )

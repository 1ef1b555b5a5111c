"""Fused BACKWARD for the encoder/decoder conv+IN+ReLU segments.

The generator's down/up stages are zero-SAME 3×3 convs feeding a param-free
instance norm and ReLU (ref ``Code/ir_colorization.py:469-482`` down1/down2,
``:503-507``/``:520-524`` up1/up2 — the rebuild's
``models/generator.py``). Their BACKWARD is the largest remaining slice of
the train step (the enc/dec backward ≈108 ms of 243.6 at b8 512×640,
docs/PERF.md round 3), previously attributed to "priced-in semantics
spread". This module applies the bottleneck blocks' proven fused-backward
machinery (VERDICT r3 next-step #2) to those segments:

* ``conv3x3_dgrad_fused(pad="zero", mask_p=True, aux=None)`` — IN backward
  + ReLU mask computed on the VMEM tile during load, zero-SAME dgrad as 3
  aligned dx-concat contractions, no reflect folds (the segments zero-pad),
  one HBM read per operand and one write for dz.
* ``conv3x3_wgrad_fused(pad="zero", mask_p=True)`` — dy recomputed on load
  from the saved raw tensor, per-tap lhsᵀ·rhs contractions into a
  VMEM-resident accumulator. Engaged per input leg when its channel count
  is 128-lane aligned (down2: 128→256, up1: 384→128 split as 256+128);
  down1's C=64 input keeps an XLA wgrad (Mosaic halo-DMA lane constraint).

The segment is exposed as a ``jax.custom_vjp`` whose PRIMAL is the same XLA
conv + one-pass IN stats + ReLU the shipped forward uses (identical output
up to relu/cast commutation, which is exact); only the backward changes.
Conv bias is mathematically inert through IN (IN(x+b) ≡ IN(x)) and its true
gradient is exactly zero (Σ_spatial of the IN backward is 0), so the fused
path neither adds bias in the primal nor emits a bias cotangent — the same
contract as the fused bottleneck blocks.

Multi-input form: ``conv(concat(a, b), K) ≡ conv(a, K[:Ca]) + conv(b,
K[Ca:])`` — the decoder's skip concat never materializes, in the backward
either: dgrad runs ONCE over the full kernel (dz splits along channels);
wgrad runs once per leg against that leg's activation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.norm import instance_norm_stats
from ircolor_tpu.ops.pallas_resblock import (
    conv3x3_dgrad_fused,
    conv3x3_wgrad_fused,
)

_XCAT_BUDGET_BYTES = 12 * 1024 * 1024


def seg_tile_h(h: int, w: int, c_dy: int, itemsize: int = 2) -> int | None:
    """Largest tile height (≤32, dividing ``h``) whose dx-concat scratch
    (th+2, w, 3·c) stays inside the VMEM budget the kernels were tuned for.
    Encoder planes are 2–4× wider than the bottleneck's, so th=32 can blow
    the scoped-vmem cap there; halving keeps the same schedule."""
    for th in (32, 16, 8, 4):
        if h % th != 0:
            continue
        if (th + 2) * w * 3 * c_dy * itemsize <= _XCAT_BUDGET_BYTES:
            return th
    return None


def _seg_primal(zs: tuple, k: jnp.ndarray):
    """relu(IN(Σ_leg conv_zero_same(z_leg, k_leg))) + saved residuals."""
    raw = None
    ofs = 0
    for z in zs:
        c = z.shape[-1]
        part = conv2d(z, k[:, :, ofs : ofs + c, :], padding=((1, 1), (1, 1)))
        raw = part if raw is None else raw + part
        ofs += c
    m, inv = instance_norm_stats(raw)
    n32 = (raw.astype(jnp.float32) - m[:, None, None, :]) * inv[:, None, None, :]
    out = jnp.maximum(n32, 0.0).astype(raw.dtype)
    return out, raw, m, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def conv_in_relu_fused(wgrad_mode: str, tile_h: int, interpret: bool, zs, k):
    """``relu(instance_norm(conv3x3_zero_same(concat(zs), k)))`` with the
    fused Pallas backward. ``zs`` is a tuple of NHWC inputs (1 for the down
    stages, 2 for the decoder skip-concat convs); ``k`` is the full
    (3, 3, ΣC_in, C_out) kernel (the reference's single-conv layout).

    ``wgrad_mode``: "fused" (both kernels Pallas — every leg must be
    128-lane aligned) or "xla" (dgrad Pallas + XLA weight contraction — for
    down1's C=64 input leg).
    """
    return _seg_primal(zs, k)[0]


def _seg_fwd(wgrad_mode, tile_h, interpret, zs, k):
    out, raw, m, inv = _seg_primal(zs, k)
    return out, (zs, k, raw, m, inv)


def _seg_bwd(wgrad_mode, tile_h, interpret, res, g):
    zs, k, raw, m, inv = res
    # Moments of the ReLU-masked cotangent p' = g·[n̂>0] against n̂, from raw
    # moments (one fused reduce pass over g and raw):
    #   gm = E[p'],  gy = E[p'·n̂] = (E[p'·raw] − m·E[p'])·inv
    gf = g.astype(jnp.float32)
    r32 = raw.astype(jnp.float32)
    mask = r32 > m[:, None, None, :]
    gmask = jnp.where(mask, gf, 0.0)
    gm = jnp.mean(gmask, axis=(1, 2))
    gy = (jnp.mean(gmask * r32, axis=(1, 2)) - m * gm) * inv

    need_dy = wgrad_mode == "xla"
    dz_full, dy = conv3x3_dgrad_fused(
        g, raw, None, k, m, inv, gm, gy,
        emit_dy=need_dy, pad="zero", mask_p=True,
        tile_h=tile_h, interpret=interpret,
    )
    dzs = []
    ofs = 0
    for z in zs:
        c = z.shape[-1]
        dzs.append(
            dz_full if len(zs) == 1
            else jax.lax.slice_in_dim(dz_full, ofs, ofs + c, axis=3)
        )
        ofs += c

    if wgrad_mode == "fused":
        dk = jnp.concatenate(
            [
                conv3x3_wgrad_fused(
                    z, g, raw, m, inv, gm, gy, pad="zero", mask_p=True,
                    tile_h=tile_h, interpret=interpret,
                )
                for z in zs
            ],
            axis=2,
        )
    else:
        # XLA weight contraction from the kernel-emitted dy; the input
        # cotangent is discarded so XLA DCEs the dgrad conv it implies.
        def f(zs_, k_):
            acc = None
            o = 0
            for z_ in zs_:
                c_ = z_.shape[-1]
                part = conv2d(
                    z_, k_[:, :, o : o + c_, :], padding=((1, 1), (1, 1))
                )
                acc = part if acc is None else acc + part
                o += c_
            return acc

        _, vjp = jax.vjp(f, zs, k)
        dk = vjp(dy)[1]
    return tuple(dzs), dk.astype(k.dtype)


conv_in_relu_fused.defvjp(_seg_fwd, _seg_bwd)

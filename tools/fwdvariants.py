"""In-context A/B of generator-forward op implementations (b16, 512×640).

The isolated-stage winners (ops.linops matmul blurs, lane-packed convs) were
picked from stagebench numbers, but in-context scheduling differs by ~30%
(docs/PERF.md "Attribution caveat"). This tool times the FULL forward
composition with one implementation knob flipped at a time, so choices are
validated where they actually run. Also provides in-context knockouts
(no-IN, no-reflect-pad) with sound chained timing — the honest version of
tools/knockout.py.

Run SERIALLY on TPU: python tools/fwdvariants.py [--variants a,b,c]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", _os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ircolor_tpu.ops.blurpool import (
    _blur_pad_sizes,
    blur_downsample,
    blur_upsample_aa,
)
from ircolor_tpu.ops.conv import conv2d, conv2d_lanepack, depthwise_conv2d
from ircolor_tpu.ops.filters import binomial_filter_2d
from ircolor_tpu.ops.norm import instance_norm, instance_norm_onepass
from ircolor_tpu.ops.padding import pad2d, reflect_pad2d
from ircolor_tpu.ops.resize import upsample2x_align_corners

DT = jnp.bfloat16


def _chained_runner(fn, x0, iters):
    @jax.jit
    def run(x):
        def body(i, carry):
            y = fn(carry)
            s = (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(carry.dtype)
            return carry.at[(0,) * carry.ndim].add(s)

        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(x.astype(jnp.float32))

    return run


def time_fn(fn, x0, iters=10, reps=3):
    r1, r2 = _chained_runner(fn, x0, iters), _chained_runner(fn, x0, 2 * iters)
    float(r1(x0)); float(r2(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(x0))
        t1 = time.perf_counter(); float(r2(x0))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / iters)
    return best


def dw_blur_down(x):
    y = pad2d(x, _blur_pad_sizes(3), "reflect")
    return depthwise_conv2d(y, binomial_filter_2d(3), stride=2, padding="VALID")


def dw_blur_up(x):
    y = upsample2x_align_corners(x)
    y = pad2d(y, _blur_pad_sizes(3), "reflect")
    return depthwise_conv2d(y, binomial_filter_2d(3), stride=1, padding="VALID")


def build_forward(
    *,
    down_blur,
    up_blur,
    use_in=True,
    in_onepass=False,
    pad_mode="reflect",
    lp_inc=True,
    lp_up2=True,
    lp_outc=True,
    res_scan=False,
    res_pallas=False,
    fused_du=False,
    fold7=False,
    fold7_inc=True,
    norm_blur=False,
    fused_head=False,
    head_q=False,
    quant=False,
    quant_fixed=(),
    nb_const_stats=False,
    in_off_sites=(),
    res_tile=None,
):
    rng = np.random.RandomState(0)

    def w(kh, kw, ci, co):
        return jnp.asarray(rng.randn(kh, kw, ci, co).astype(np.float32) * 0.05).astype(DT)

    ngf = 64
    p = {
        "inc": w(7, 7, 1, ngf),
        "d1": w(3, 3, ngf, 2 * ngf),
        "d2": w(3, 3, 2 * ngf, 4 * ngf),
        "res": [(w(3, 3, 256, 256), w(3, 3, 256, 256)) for _ in range(9)],
        "u1": w(3, 3, 6 * ngf, 2 * ngf),
        "u2": w(3, 3, 3 * ngf, ngf),
        "out": w(7, 7, ngf, 3),
    }

    in_fn = instance_norm_onepass if in_onepass else instance_norm

    def inr(v, site=None):
        if not use_in or (site is not None and site in in_off_sites):
            return jax.nn.relu(v)
        return jax.nn.relu(in_fn(v))

    def innorm(v):
        return in_fn(v) if use_in else v

    def rpad(v, n):
        if pad_mode == "reflect":
            return reflect_pad2d(v, n)
        return v  # zero-SAME handled by the conv padding below

    # quant=True → all four enc/dec conv sites on the XLA int8 path;
    # quant=tuple(sites) → only those sites (per-site A/B, round 5);
    # quant_fixed=tuple(sites) → those sites additionally skip the dynamic
    # per-sample amax: their inputs are post-IN+ReLU (bounded ≈[0, 6σ]), so
    # the fixed 127/6σ scale is exact-enough and removes the amax reduce +
    # its scheduling barrier (the suspected QuantConv in-context killer).
    qsites = (
        {"d1", "d2", "u1", "u2"} if quant is True
        else set(quant) if quant else set()
    )

    def q3(v, k, padding=((1, 1), (1, 1)), site=None):
        """int8 MXU conv (ops.quant): per-channel weights, per-sample acts."""
        from jax import lax

        from ircolor_tpu.ops.quant import conv2d_int8, quantize_weight_per_channel

        if site in quant_fixed:
            wq, sw = quantize_weight_per_channel(k)
            xq = jnp.minimum(
                jnp.round(v.astype(jnp.float32) * (127.0 / 6.0)), 127.0
            ).astype(jnp.int8)  # inputs ≥ 0 post-IN+ReLU: no low clip
            dn = lax.conv_dimension_numbers(
                xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
            y32 = lax.conv_general_dilated(
                xq, wq, (1, 1), padding, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            return (y32.astype(jnp.float32) * (sw * (6.0 / 127.0))).astype(DT)
        return conv2d_int8(v, k, padding=padding, out_dtype=DT)

    def conv_pad(v, k, n):
        """reflect: pre-padded VALID conv; fold: border-corrected zero-SAME
        (ops.conv.conv3x3_reflect, no materialized pad); zero: SAME conv."""
        if quant:
            if pad_mode == "reflect":
                return q3(rpad(v, n), k, padding="VALID")
            return q3(v, k, padding=((n, n), (n, n)))
        if pad_mode == "fold":
            from ircolor_tpu.ops.conv import conv3x3_reflect

            return conv3x3_reflect(v, k)
        if pad_mode == "reflect":
            return conv2d(rpad(v, n), k, padding="VALID")
        return conv2d(v, k, padding=((n, n), (n, n)))

    def lp(v, k, pnum, enabled, padding="SAME"):
        if enabled:
            return conv2d_lanepack(v, k, pnum, padding=padding)
        return conv2d(v, k, padding=((1, 1), (1, 1)) if padding == "SAME" else "VALID")

    def pad7_conv(v, k, pnum, enabled, site="out"):
        """7×7 head conv: reflect pre-pad (real model) or, in the zero_pads
        knockout, zero padding folded into the conv — so the knockout covers
        the inc/outc pads too, not just the 18 resblock pads. fold7: exact
        reflect WITHOUT the materialized pad (ops.conv.conv_reflect_same —
        zero-SAME bulk + border-strip overwrite); fold7_inc=False restricts
        the fold to outc (inc's pad is a cheap C=1 materialization — the
        −7.1 ms pads knockout is almost all outc's)."""
        if fold7 and (fold7_inc or site == "out"):
            from ircolor_tpu.ops.conv import _conv_reflect_same_impl

            borders = "hw" if fold7 is True else fold7
            return _conv_reflect_same_impl(
                v, k, n=k.shape[0] // 2, p=pnum if enabled else 1,
                bias=None, precision=None, borders=borders,
            )
        if pad_mode in ("reflect", "fold"):  # fold targets only resblocks
            return lp(reflect_pad2d(v, 3), k, pnum, enabled, padding="VALID")
        if enabled:
            return conv2d_lanepack(v, k, pnum, padding=((3, 3), (3, 3)))
        return conv2d(v, k, padding=((3, 3), (3, 3)))

    def one_res(h, kpair):
        k1, k2 = kpair
        if res_pallas == "int8":
            from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas_q

            th = res_tile or (32 if h.shape[1] % 32 == 0 else 16)
            return resnet_block_pallas_q(h, k1, k2, tile_h=th)
        if res_pallas:
            from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas

            th = res_tile or (32 if h.shape[1] % 32 == 0 else 16)
            return resnet_block_pallas(h, k1, k2, tile_h=th)
        r = inr(conv_pad(h, k1, 1))
        return h + innorm(conv_pad(r, k2, 1))

    res_stack = (
        jnp.stack([k1 for k1, _ in p["res"]]),
        jnp.stack([k2 for _, k2 in p["res"]]),
    )

    def fused_inr(inputs, kernels):
        """conv3x3_sum_fused + f32 normalize/ReLU (fuses into the consumer)."""
        from ircolor_tpu.ops.pallas_resblock import conv3x3_sum_fused

        raw, m, inv = conv3x3_sum_fused(inputs, kernels, pad="zero", tile_h=16)
        y = (raw.astype(jnp.float32) - m[:, None, None, :]) * inv[:, None, None, :]
        return jax.nn.relu(y).astype(raw.dtype)

    def norm_blur_down(raw):
        """Fused IN-normalize+ReLU+reflect-blur-pool (one read + 1/4 write;
        ops.pallas_blur.norm_relu_blur_down_pallas). Stats by XLA reduce.
        The conv OUTPUTS are 128-aligned at d1 (128) and d2 (256), so both
        down stages qualify (it is the conv INPUT C=64 that blocks the
        sum_fused conv at d1, not this kernel)."""
        from ircolor_tpu.ops.norm import instance_norm_stats
        from ircolor_tpu.ops.pallas_blur import norm_relu_blur_down_pallas

        if nb_const_stats:  # WRONG MATH — stats-read cost probe only
            m = jnp.zeros((raw.shape[0], raw.shape[-1]), jnp.float32)
            inv = jnp.ones_like(m)
        else:
            m, inv = instance_norm_stats(raw)
        return norm_relu_blur_down_pallas(raw, m, inv)

    def fwd(v):
        x0 = inr(pad7_conv(v.astype(DT), p["inc"], 2, lp_inc, site="inc"), site="inc")
        # d1 (x0 C=64) and u2 (x0 skip C=64) CANNOT fuse: Mosaic can't
        # DMA-slice sub-128-channel legs (see conv3x3_sum_fused). Only the
        # 128-aligned stages — d2 (128→256) and u1 (256+128→128) — fuse.
        def c3(v, k, site=None):
            if site in qsites:
                return q3(v, k, site=site)
            return conv2d(v, k, padding=((1, 1), (1, 1)))

        if norm_blur:
            x1 = norm_blur_down(c3(x0, p["d1"], site="d1"))
            h = norm_blur_down(c3(x1, p["d2"], site="d2"))
        else:
            x1 = down_blur(inr(c3(x0, p["d1"], site="d1")))
            if fused_du:
                h = down_blur(fused_inr([x1], [p["d2"]]))
            else:
                h = down_blur(inr(c3(x1, p["d2"], site="d2")))
        if res_scan:
            h = jax.lax.scan(
                lambda c, ks: (one_res(c, ks), None), h, res_stack
            )[0]
        else:
            for k1, k2 in p["res"]:
                h = one_res(h, (k1, k2))
        y = up_blur(h)
        ca = y.shape[-1]
        if fused_du:
            y = fused_inr([y, x1], [p["u1"][:, :, :ca], p["u1"][:, :, ca:]])
        else:
            y = inr(c3(y, p["u1"][:, :, :ca], site="u1")
                    + c3(x1, p["u1"][:, :, ca:], site="u1"), site="u1")
        y = up_blur(y)
        ca = y.shape[-1]
        u2c = (
            (lambda v, k: q3(v, k, site="u2")) if "u2" in qsites
            else (lambda v, k: lp(v, k, 2, lp_up2))
        )
        raw2 = u2c(y, p["u2"][:, :, :ca]) + u2c(x0, p["u2"][:, :, ca:])
        if fused_head:
            # Fused 7×7 head: up2's IN+ReLU, the reflect pad, and the conv
            # in one Pallas read + packed write (ops.pallas_head). Stats by
            # XLA reduce (fused into the conv epilogue).
            from ircolor_tpu.ops.norm import instance_norm_stats
            from ircolor_tpu.ops.pallas_head import conv7x7_head_pallas

            if nb_const_stats:  # WRONG MATH — stats-read cost probe only
                m = jnp.zeros((raw2.shape[0], raw2.shape[-1]), jnp.float32)
                i = jnp.ones_like(m)
            else:
                m, i = instance_norm_stats(raw2)
            return jnp.tanh(
                conv7x7_head_pallas(raw2, m, i, p["out"], quant=head_q)
            )
        y = inr(raw2)
        return jnp.tanh(pad7_conv(y, p["out"], 32, lp_outc))

    return fwd


# "base" = the SHIPPED model configuration (round 2 winners): depthwise
# down-blur (blur_downsample's default), matmul up-blur, lane-packing only
# at outc, one-pass IN stats. Other variants flip one knob AWAY from it so
# future measurements test against what actually runs.
_BASE = dict(
    down_blur=blur_downsample, up_blur=blur_upsample_aa,
    lp_inc=False, lp_up2=False, in_onepass=True,
)
VARIANTS = {
    "base": dict(_BASE),
    "matmul_down": dict(_BASE, down_blur=lambda x: blur_downsample(x, use_matmul=True)),
    "dw_up": dict(_BASE, up_blur=dw_blur_up),
    "twopass_in": dict(_BASE, in_onepass=False),
    "no_in": dict(_BASE, use_in=False),                # knockout, not shippable
    "zero_pads": dict(_BASE, pad_mode="zero"),         # knockout, not shippable
    "lp_inc": dict(_BASE, lp_inc=True),
    "lp_up2": dict(_BASE, lp_up2=True),
    "no_lp_outc": dict(_BASE, lp_outc=False),
    "res_scan": dict(_BASE, res_scan=True),
    # Border-corrected reflect conv in the resblocks (no materialized pad).
    "reflect_fold": dict(_BASE, pad_mode="fold"),
    # Round-3 fused reflect-conv-IN resblock kernel (ops/pallas_resblock) —
    # the in-context number that decides whether --pallas-block ships.
    "pallas_block": dict(_BASE, res_pallas=True),
    # Fused 128-aligned down/decoder convs (conv3x3_sum_fused: zero halos
    # in-kernel, free IN stats, concat-free u1 skip conv) on top of the
    # fused blocks. d1/u2 keep XLA (C=64 legs can't DMA — Mosaic tiling).
    "pallas_all": dict(_BASE, res_pallas=True, fused_du=True),
    # Round-3 ceiling knockouts ON TOP of the shipped fused blocks: what the
    # remaining (non-bottleneck) INs and reflect pads still cost in-context.
    "pb_no_in": dict(_BASE, res_pallas=True, use_in=False),     # knockout
    "pb_zero_pads": dict(_BASE, res_pallas=True, pad_mode="zero"),  # knockout
    "pb_ceiling": dict(_BASE, res_pallas=True, use_in=False, pad_mode="zero"),
    # Exact reflect 7×7 heads WITHOUT the materialized pad (zero-SAME bulk +
    # border-strip overwrite, ops.conv.conv_reflect_same) on the fused blocks.
    "pb_fold7": dict(_BASE, res_pallas=True, fold7=True),
    # Fused IN-normalize+ReLU+blur-pool at both down stages on top of the
    # fused blocks (ops.pallas_blur.norm_relu_blur_down_pallas; stats stay
    # an XLA reduce fused into the conv epilogue).
    "pb_normblur": dict(_BASE, res_pallas=True, norm_blur=True),
    # Fused 7×7 output head on top of the fused blocks (ops.pallas_head:
    # IN+ReLU on load, reflect halos in-kernel, p=32 lane-packed matmuls).
    "pb_head": dict(_BASE, res_pallas=True, fused_head=True),
    # Everything-on candidate: fused blocks + down-tails + head.
    "pb_nb_head": dict(_BASE, res_pallas=True, norm_blur=True, fused_head=True),
    # int8 MXU serving mode (ops/quant.py): heavy convs on the 2× int8 path
    # (per-channel weights, dynamic per-sample activations), XLA blocks —
    # the in-context number that decides whether --quant-int8 beats the
    # fused bf16 kernels. Run tools/int8probe.py first: if the isolated
    # int8 conv is not ≥1.5× bf16, this variant cannot win.
    "int8": dict(_BASE, quant=True),
    # int8 convs + the fused 7×7 head (independent sites — the head kernel
    # reads the float up2 output either way).
    "int8_head": dict(_BASE, quant=True, fused_head=True),
    # int8 MXU matmuls INSIDE the fused block kernel (resnet_block_pallas_q:
    # bf16 HBM traffic unchanged, quantize-on-load in VPU, int8 dx-concat
    # contractions halve the 3.92 ms/block MXU floor). Unlike the XLA-level
    # "int8" variant, no quantize epilogue ever touches HBM or breaks a
    # fusion — the in-context number that decides the quantized-serving mode.
    "pb_int8": dict(_BASE, res_pallas="int8"),
    # int8 blocks + XLA int8 encoder/decoder convs (the full quant mode).
    "pb_int8_full": dict(_BASE, res_pallas="int8", quant=True),
    # int8 blocks + the bf16 nb/head kernels (no XLA quant convs) — the
    # run-D WINNER (103.0 ms) and what `--quant-int8` now ships at shapes
    # where nb/head engage (the generator auto-deselects QuantConv there).
    "int8_nbh": dict(_BASE, res_pallas="int8", norm_blur=True, fused_head=True),
    # int8 blocks + XLA int8 enc/dec convs + bf16 nb/head kernels — LOST
    # run D (106.0 ms: the quant convs' dequant epilogues break the nb/head
    # kernels' normalize-on-load fusion).
    "int8_ship": dict(
        _BASE, res_pallas="int8", quant=True, norm_blur=True, fused_head=True
    ),
    # ---- Round-5 256² small-plane probes (VERDICT r4 #4): the fused
    # blocks lose at 256² b16 with the default tiles (th=32 → grid depth 2
    # per image); smaller tiles deepen the launch grid. Run with
    # --height 256 --width 256.
    "pb_th16": dict(_BASE, res_pallas=True, res_tile=16),
    "pb_th8": dict(_BASE, res_pallas=True, res_tile=8),
    "pb_int8_th16": dict(_BASE, res_pallas="int8", res_tile=16),
    "pb_int8_th8": dict(_BASE, res_pallas="int8", res_tile=8),
    # 256² quant ROUTING probes (which enc/dec form should ride with the
    # winning int8-th16 blocks): XLA QuantConv everywhere vs fixed-scale
    # u2 only vs float enc/dec (= pb_int8_th16 above).
    "pb_int8_th16_qc": dict(_BASE, res_pallas="int8", res_tile=16, quant=True),
    "pb_int8_th16_qcfu2": dict(
        _BASE, res_pallas="int8", res_tile=16, quant=("u2",), quant_fixed=("u2",),
    ),
    # ---- Round-5 int8-coverage sweep (VERDICT r4 #1): extend int8 beyond
    # the blocks. Base for every row: int8_nbh (the shipped serving combo).
    # OUTCOME: the speed winners (int8_qcf_u2 −20.3/−4.1 ms, int8_nbh_hq
    # −0.7/−0.9) FAILED the end-to-end accuracy gate on a trained ckpt
    # (u2-fixed alone −0.277 dB, head_q alone −0.796 — no downstream IN
    # to renormalize end-of-network quant noise) and shipped as OPT-IN
    # only (Config.quant_fixed_u2 / quant_head). docs/PERF.md round 5.
    # int8 fused head: the ops/pallas_head quant=True kernel (int8
    # matmuls inside the same schedule — no epilogue touches HBM).
    "int8_nbh_hq": dict(
        _BASE, res_pallas="int8", norm_blur=True, fused_head=True, head_q=True,
    ),
    # Per-site XLA QuantConv re-probes (run D's +3.0 ms verdict was
    # all-sites-at-once; the losing site may be one of four): one enc/dec
    # conv on the dynamic-amax int8 path at a time.
    "int8_qc_d1": dict(
        _BASE, res_pallas="int8", norm_blur=True, fused_head=True,
        quant=("d1",),
    ),
    "int8_qc_d2": dict(
        _BASE, res_pallas="int8", norm_blur=True, fused_head=True,
        quant=("d2",),
    ),
    "int8_qc_u1": dict(
        _BASE, res_pallas="int8", norm_blur=True, fused_head=True,
        quant=("u1",),
    ),
    "int8_qc_u2": dict(
        _BASE, res_pallas="int8", norm_blur=True, fused_head=True,
        quant=("u2",),
    ),
    # Fixed-scale (127/6σ, no amax reduce) int8 at the post-IN+ReLU-input
    # sites — removes the dynamic quantize's reduce barrier entirely.
    "int8_qcf_d1": dict(
        _BASE, res_pallas="int8", norm_blur=True, fused_head=True,
        quant=("d1",), quant_fixed=("d1",),
    ),
    "int8_qcf_d2": dict(
        _BASE, res_pallas="int8", norm_blur=True, fused_head=True,
        quant=("d2",), quant_fixed=("d2",),
    ),
    "int8_qcf_u2": dict(
        _BASE, res_pallas="int8", norm_blur=True, fused_head=True,
        quant=("u2",), quant_fixed=("u2",),
    ),
    "int8_qcf_du": dict(
        _BASE, res_pallas="int8", norm_blur=True, fused_head=True,
        quant=("d1", "d2", "u2"), quant_fixed=("d1", "d2", "u2"),
    ),
    # Everything-int8 candidate: int8 blocks + nb + int8 head + fixed-scale
    # d1/d2/u2 + dynamic u1.
    "int8_full5": dict(
        _BASE, res_pallas="int8", norm_blur=True, fused_head=True, head_q=True,
        quant=("d1", "d2", "u1", "u2"), quant_fixed=("d1", "d2", "u2"),
    ),
    # The round-5 run-A winner (qcf_u2 −20.3 ms) combined with the int8
    # head (neutral alone; u2's output is the head's input — compose check).
    "int8_qcf_u2_hq": dict(
        _BASE, res_pallas="int8", norm_blur=True, fused_head=True, head_q=True,
        quant=("u2",), quant_fixed=("u2",),
    ),
    # Round-3 remaining-gap attribution ON TOP of the shipped nb+head combo
    # (pb_nb_head). All WRONG MATH — perf probes only.
    # What the nb/head kernels' XLA stats reduces still cost (what stats
    # EPILOGUES on the producing convs would reclaim):
    "nbh_freestats": dict(
        _BASE, res_pallas=True, norm_blur=True, fused_head=True,
        nb_const_stats=True,
    ),
    # The two remaining XLA INs, separately (stats read + normalize pass):
    "nbh_no_inc_in": dict(
        _BASE, res_pallas=True, norm_blur=True, fused_head=True,
        in_off_sites=("inc",),
    ),
    "nbh_no_up1_in": dict(
        _BASE, res_pallas=True, norm_blur=True, fused_head=True,
        in_off_sites=("u1",),
    ),
    # Revised float ceiling: everything semantics-bound knocked out on the
    # shipped kernel set.
    "nbh_ceiling": dict(
        _BASE, res_pallas=True, norm_blur=True, fused_head=True,
        nb_const_stats=True, use_in=False, pad_mode="zero",
    ),
    # Bisection probes (WRONG math — perf attribution of the two strip pairs).
    "pb_fold7_tb": dict(_BASE, res_pallas=True, fold7="h"),
    "pb_fold7_lr": dict(_BASE, res_pallas=True, fold7="w"),
    # outc-only fold (inc keeps the cheap C=1 materialized pad).
    "pb_fold7_outc": dict(_BASE, res_pallas=True, fold7=True, fold7_inc=False),
    "pb_fold7_outc_tb": dict(_BASE, res_pallas=True, fold7="h", fold7_inc=False),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    args = ap.parse_args()

    rng = np.random.RandomState(1)
    b = args.batch
    ir = jnp.asarray(rng.rand(b, args.height, args.width, 1).astype(np.float32) * 2 - 1)
    base = None
    for name in args.variants.split(","):
        # One broken variant (a kernel that fails remote lowering, say) must
        # not abort the whole serial measurement run — later variants are
        # independent ship decisions.
        try:
            fwd = build_forward(**VARIANTS[name])
            t = time_fn(fwd, ir, iters=args.iters)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:14s} FAILED: {type(exc).__name__}: {exc}", flush=True)
            continue
        if name == "base":
            base = t
        rel = f"  ({(t - base) * 1e3:+6.2f} ms vs base)" if base is not None and name != "base" else ""
        print(f"{name:14s} {t * 1e3:8.2f} ms  {b / t:6.1f} fps{rel}", flush=True)


if __name__ == "__main__":
    main()

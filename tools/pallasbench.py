"""In-graph Pallas vs XLA comparison at the bottleneck shape.

Round-1 comparisons used single-dispatch timing, which the axon relay's
fixed per-call cost polluted badly (XLA's chained 3×3 conv actually runs at
~194 TF/s, not the 72 previously recorded). This re-measures with the
fori_loop-chained method from tools/stagebench.py:

  * XLA 3×3 conv (SAME) — the floor any custom conv must match
  * Pallas implicit-GEMM conv (single/double buffered)
  * XLA full ResnetBlock (pad+conv+IN+ReLU+pad+conv+IN+residual)
  * Pallas fused block (conv3x3_stats + conv3x3_norm_in_stats + epilogue)

Run SERIALLY on the TPU.
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

from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.norm import instance_norm
from ircolor_tpu.ops.padding import reflect_pad2d
from ircolor_tpu.ops.pallas_conv import conv3x3_valid_pallas, conv3x3_valid_pallas_v2
from ircolor_tpu.ops.pallas_block import conv3x3_stats, conv3x3_norm_in_stats
from ircolor_tpu.ops.pallas_resblock import (
    conv3x3_reflect_fused,
    resnet_block_pallas,
    resnet_block_pallas_q,
)

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


def stage_time(fn, x0, iters=12, reps=3):
    r1 = _chained_runner(fn, x0, iters)
    r2 = _chained_runner(fn, x0, 2 * iters)
    float(r1(x0))
    float(r2(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(x0))
        t1 = time.perf_counter()
        float(r2(x0))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", default="128x160")
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--tile-h", type=int, default=16)
    ap.add_argument("--cases", default=None,
                    help="comma-separated substrings; run only matching cases "
                    "(one wedged Mosaic compile must not kill the batch)")
    args = ap.parse_args()

    def selected(name: str) -> bool:
        if args.cases is None:
            return True
        return any(s.strip() in name for s in args.cases.split(","))
    b, c = args.batch, args.c
    h, w = (int(v) for v in args.hw.split("x"))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32) * 2 - 1).astype(DT)
    k1 = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.05).astype(DT)
    k2 = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.05).astype(DT)
    conv_flops = 2 * b * h * w * 9 * c * c

    def padded(v):
        return jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))

    cases = {
        "xla conv3x3 SAME": lambda v: conv2d(v, k1, padding=((1, 1), (1, 1))),
        "pallas conv3x3 db": lambda v: conv3x3_valid_pallas(
            padded(v), k1, tile_h=args.tile_h, double_buffer=True,
        ),
    }
    for th in (args.tile_h, 32, 64):
        if h % th:
            continue
        for mode in ("preshift", "dxcat"):
            cases[f"pallas v2 {mode} th={th}"] = (
                lambda v, th=th, mode=mode: conv3x3_valid_pallas_v2(
                    padded(v), k1, tile_h=th, mode=mode,
                )
            )
    for name, fn in cases.items():
        if not selected(name):
            continue
        try:
            t = stage_time(fn, x)
        except Exception as e:  # Mosaic compile failures are silent HTTP 500s
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        print(f"{name:28s} {t*1e3:8.2f} ms  {conv_flops/t/1e12:7.1f} TF/s", flush=True)

    def xla_block_k(v, a, b):
        r = jax.nn.relu(instance_norm(conv2d(reflect_pad2d(v, 1), a, padding="VALID")))
        return v + instance_norm(conv2d(reflect_pad2d(r, 1), b, padding="VALID"))

    def xla_block(v):
        return xla_block_k(v, k1, k2)

    def fused_block(v):
        raw1, m1, i1 = conv3x3_stats(reflect_pad2d(v, 1), k1, tile_h=args.tile_h)
        raw2, m2, i2 = conv3x3_norm_in_stats(
            reflect_pad2d(raw1, 1), k2, m1, i1, tile_h=args.tile_h
        )
        return v + ((raw2.astype(jnp.float32) - m2[:, None, None, :])
                    * i2[:, None, None, :]).astype(v.dtype)

    block_cases = [("xla resblock", xla_block), ("pallas fused block", fused_block)]
    for th in dict.fromkeys((args.tile_h, 32)):  # dedup when --tile-h 32
        if h % th:
            continue
        block_cases.append((
            f"pallas v3 reflconv th={th}",
            lambda v, th=th: conv3x3_reflect_fused(v, k1, tile_h=th)[0],
        ))
        block_cases.append((
            f"pallas v3 block th={th}",
            lambda v, th=th: resnet_block_pallas(v, k1, k2, tile_h=th),
        ))
        block_cases.append((
            f"pallas int8 block th={th}",
            lambda v, th=th: resnet_block_pallas_q(v, k1, k2, tile_h=th),
        ))
    # fwd+bwd (jax.vjp) cases: is the block BACKWARD close to its 4-conv
    # floor, or is there a fused-backward lever? Cotangent = the primal
    # output (data-dependent, not constant-foldable); the dk wgrads are kept
    # live through a scalar add so XLA cannot DCE them. Subtract the known
    # fwd-only numbers to attribute the backward share.
    def _vjp_case(block_fn):
        def run(v):
            out, vjp = jax.vjp(block_fn, v, k1, k2)
            dx, dk1, dk2 = vjp(out)
            keep = (jnp.sum(dk1.astype(jnp.float32))
                    + jnp.sum(dk2.astype(jnp.float32))) * 1e-12
            return dx + keep.astype(dx.dtype)
        return run

    block_cases.append((
        "xla resblock vjp",
        _vjp_case(lambda v, a, b: xla_block_k(v, a, b)),
    ))
    for th in dict.fromkeys((args.tile_h, 32)):
        if h % th:
            continue
        block_cases.append((
            f"pallas v3 block vjp th={th}",
            _vjp_case(lambda v, a, b, th=th: resnet_block_pallas(
                v, a, b, tile_h=th)),
        ))

    for name, fn in block_cases:
        if not selected(name):
            continue
        try:
            t = stage_time(fn, x)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        mult = 2 if "vjp" in name else (1 if "reflconv" in name else 2)
        print(f"{name:28s} {t*1e3:8.2f} ms  {mult*conv_flops/t/1e12:7.1f} TF/s-equiv",
              flush=True)

    # --- fused 7×7 output head (ops/pallas_head) at the full-res shape ---
    # The head runs at 4× the bottleneck H/W with C=64→3; the XLA baseline
    # is the shipped segment (one-pass IN + ReLU + reflect pad + p=32
    # lane-packed conv). Includes each side's stats/normalize passes.
    from ircolor_tpu.ops.conv import conv2d_lanepack
    from ircolor_tpu.ops.norm import instance_norm_onepass, instance_norm_stats
    from ircolor_tpu.ops.pallas_head import conv7x7_head_pallas, head_supported

    h4, w4, ch = 4 * h, 4 * w, 64
    xh = jnp.asarray(rng.rand(b, h4, w4, ch).astype(np.float32) * 2 - 1).astype(DT)
    k7 = jnp.asarray(rng.randn(7, 7, ch, 3).astype(np.float32) * 0.05).astype(DT)
    head_flops = 2 * b * h4 * w4 * 49 * ch * 3

    def xla_head(v):
        z = jax.nn.relu(instance_norm_onepass(v))
        return conv2d_lanepack(reflect_pad2d(z, 3), k7, 32, padding="VALID")

    head_cases = [("xla head (IN+pad+lp32)", xla_head)]
    if head_supported((b, h4, w4, ch)):
        for th in (16, 32):
            if h4 % th:
                continue
            head_cases.append((
                f"pallas head th={th}",
                lambda v, th=th: conv7x7_head_pallas(
                    v, *instance_norm_stats(v), k7, tile_h=th
                ),
            ))
    for name, fn in head_cases:
        if not selected(name):
            continue
        try:
            t = stage_time(fn, xh)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        print(f"{name:28s} {t*1e3:8.2f} ms  {head_flops/t/1e12:7.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

"""Chained timing of the test-mode step's METRIC tail (quantize + suite).

(Sibling of the round-1 tools/metricsbench.py, which decomposes generator
vs metrics vs blur at step level; this probe drills INTO the metric tail —
SSIM window pipeline, pointwise terms, quantize — and A/Bs the stacked-
matmul SSIM variant.)

The headline bench (bench.py) times G-forward + uint8 quantize +
MAE/MSE/PSNR/SSIM; in-context forward alone is ~119.5 ms at b16 512×640 vs
~128.4 for the step ⇒ ~8.9 ms of metric tail. This probe splits that tail
with the standard chained fori_loop methodology (data-dependent iterations;
the relay's ~35 ms RPC latency is amortized away).

Variants:
  suite      — quantize_to_uint8_01(pred) + batched_metrics (the shipped tail)
  ssim       — SSIM only (the window-filter pipeline)
  ssim_stack — SSIM with the 5 window filters batched into ONE stacked
               per-axis matmul pair (A/B: fewer, bigger MXU launches vs an
               extra stack materialization)
  pointwise  — MAE/MSE/PSNR only
  quant      — the uint8 round-trip alone

Run SERIALLY on TPU: python tools/metricbench.py [--batch 16]
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

from ircolor_tpu.eval.metrics import (
    batched_metrics,
    quantize_to_uint8_01,
    ssim_skimage,
)
from ircolor_tpu.utils.timing import start_transfer_warmup


def _ssim_stacked(pred, gt):
    """SSIM with one stacked 5-plane window-filter matmul pair."""
    from ircolor_tpu.ops.linops import apply_axis_ops_chfirst, window_matrix

    win_size, k1, k2, data_range = 7, 0.01, 0.03, 1.0
    p = jnp.moveaxis(pred.astype(jnp.float32), 3, 1)
    g = jnp.moveaxis(gt.astype(jnp.float32), 3, 1)
    np_pix = win_size * win_size
    cov_norm = np_pix / (np_pix - 1.0)
    _, _, h, w = p.shape
    weights = (1.0 / win_size,) * win_size
    m_h = window_matrix(h, weights, "valid")
    m_w = window_matrix(w, weights, "valid")
    stack = jnp.concatenate([p, g, p * p, g * g, p * g], axis=1)  # (B,5C,H,W)
    f = apply_axis_ops_chfirst(stack, m_h, m_w)
    c = p.shape[1]
    ux, uy, uxx, uyy, uxy = (f[:, i * c:(i + 1) * c] for i in range(5))
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2)
    )
    return jnp.mean(s, axis=(1, 2, 3))


def make_fn(name):
    if name == "suite":
        return lambda pr, gt: batched_metrics(quantize_to_uint8_01(pr), gt)["ssim"]
    if name == "ssim":
        return lambda pr, gt: ssim_skimage(pr, gt)
    if name == "ssim_stack":
        return _ssim_stacked
    if name == "pointwise":
        def f(pr, gt):
            m = jnp.mean(jnp.abs(pr - gt), axis=(1, 2, 3))
            mse = jnp.mean((pr - gt) ** 2, axis=(1, 2, 3))
            return m + (-10.0 * jnp.log10(mse + 1e-12))
        return f
    if name == "quant":
        return lambda pr, gt: jnp.mean(quantize_to_uint8_01(pr), axis=(1, 2, 3))
    raise ValueError(name)


def time_variant(name, pred, gt, iters, reps=3):
    fn = make_fn(name)

    def chained(it):
        @jax.jit
        def run(pr, gt):
            def body(i, carry):
                v = fn(pr + carry * 1e-12, gt)
                return carry + jnp.mean(v) * 1e-12

            return jax.lax.fori_loop(0, it, body, jnp.float32(0.0))

        return run

    r1, r2 = chained(iters), chained(2 * iters)
    float(r1(pred, gt)); float(r2(pred, gt))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(pred, gt))
        t1 = time.perf_counter(); float(r2(pred, gt))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / iters)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument(
        "--variants", default="suite,ssim,ssim_stack,pointwise,quant"
    )
    args = p.parse_args()
    start_transfer_warmup()
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.rand(args.batch, args.height, args.width, 3).astype(np.float32))
    gt = jnp.asarray(rng.rand(args.batch, args.height, args.width, 3).astype(np.float32))
    # Parity guard for the stacked variant before timing it.
    a = np.asarray(ssim_skimage(pred, gt))
    b = np.asarray(_ssim_stacked(pred, gt))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
    for name in args.variants.split(","):
        dt = time_variant(name, pred, gt, args.iters)
        print(f"{name:10s} {dt * 1e3:8.2f} ms  ({dt * 1e3 / args.batch:.3f} ms/frame)",
              flush=True)


if __name__ == "__main__":
    main()

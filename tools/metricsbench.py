"""Decompose the test-mode device step: generator vs metrics suite vs blur
formulations. In-graph chained timing (tools/stagebench.py methodology).
Run SERIALLY on TPU.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", _os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ircolor_tpu.eval.metrics import batched_metrics, quantize_to_uint8_01
from ircolor_tpu.ops.blurpool import blur_downsample

B = 16


def _chained_runner(fn, x0, iters):
    @jax.jit
    def run(x):
        def body(i, carry):
            y = fn(carry)
            # Sum EVERY output leaf into the dependency — feeding only one
            # leaf lets XLA dead-code-eliminate the rest of the computation.
            s = sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree_util.tree_leaves(y)
            ) * 1e-12
            return carry.at[(0,) * carry.ndim].add(s.astype(carry.dtype))

        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(x.astype(jnp.float32))

    return run


def stage_time(fn, x0, iters=12, reps=3):
    r1, r2 = _chained_runner(fn, x0, iters), _chained_runner(fn, x0, 2 * iters)
    float(r1(x0)); float(r2(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(x0))
        t1 = time.perf_counter(); float(r2(x0))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / iters)
    return best


def blur_down_phase(x):
    """Phase-split shift-add blur-pool (filt 3, stride 2, reflect) — a
    fusion-friendly alternative to the matmul formulation."""
    b, h, w, c = x.shape
    xr = x.reshape(b, h // 2, 2, w, c)
    xe, xo = xr[:, :, 0], xr[:, :, 1]
    xm = jnp.concatenate([x[:, 1:2], xo[:, :-1]], axis=1)
    yh = xm + 2.0 * xe + xo
    yr = yh.reshape(b, h // 2, w // 2, 2, c)
    ye, yo = yr[:, :, :, 0], yr[:, :, :, 1]
    ym = jnp.concatenate([yh[:, :, 1:2], yo[:, :, :-1]], axis=2)
    return (ym + 2.0 * ye + yo) * (1.0 / 16.0)


def main():
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.rand(B, 512, 640, 3).astype(np.float32))
    pred = jnp.asarray(rng.rand(B, 512, 640, 3).astype(np.float32))

    t = stage_time(lambda v: batched_metrics(quantize_to_uint8_01(v), gt), pred)
    print(f"quantize+metrics      {t*1e3:8.2f} ms", flush=True)
    t = stage_time(lambda v: batched_metrics(v, gt), pred)
    print(f"metrics suite         {t*1e3:8.2f} ms", flush=True)
    from ircolor_tpu.eval.metrics import ssim_skimage

    t = stage_time(lambda v: {"ssim": ssim_skimage(v, gt)}, pred)
    print(f"ssim part             {t*1e3:8.2f} ms", flush=True)

    # Blur formulations at the two big shapes.
    for c, h, w in ((128, 512, 640), (256, 256, 320)):
        x = jnp.asarray(rng.rand(B, h, w, c).astype(np.float32) * 2 - 1).astype(jnp.bfloat16)
        t_m = stage_time(blur_downsample, x)
        t_p = stage_time(blur_down_phase, x)
        ref = np.asarray(blur_downsample(x).astype(jnp.float32))
        got = np.asarray(blur_down_phase(x).astype(jnp.float32))
        err = np.abs(ref - got).max()
        print(f"blur_down {h}x{w}x{c}: matmul {t_m*1e3:6.2f} ms | phase "
              f"{t_p*1e3:6.2f} ms | max|Δ| {err:.2e}", flush=True)


if __name__ == "__main__":
    main()

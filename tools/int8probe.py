"""Does XLA's TPU conv hit the int8 MXU path at our shapes?

v5e's MXU runs int8×int8→int32 at 2× the bf16 rate (394 vs 197 TOPS). If
``lax.conv_general_dilated`` on int8 operands reaches ~2× the measured bf16
conv throughput at the generator's bottleneck shape, a quantized inference
mode (per-channel int8 weights + dynamic activation scales, opt-in — the
parity-budget default stays bf16/f32) is the next big forward lever after
the fused kernels: the 512×640 forward is ~56 ms of conv floor, so halving
conv time is worth ~25-30 ms/frame-batch. If int8 lowers to something slow
(upcast to bf16, or VPU emulation), the question closes here for this
hardware generation.

Cases (in-graph chained timing, same methodology as tools/bwbench.py —
requantize int32→int8 inside the chain, which is exactly the work a real
quantized pipeline pays between layers):

* matmul bf16 / int8 at 4096³ — the MXU capability check, conv-free.
* conv3×3 bf16 / int8 at the bottleneck shape (16,128,160,256→256).
* conv3×3 int8 with bf16 dequant epilogue (scale·int32→bf16) — the shape a
  quantized layer's output actually takes when the next op needs floats.

Run SERIALLY on TPU: python tools/int8probe.py
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
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir", _os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _chained_runner(fn, iters):
    """carry = fn(carry) chain with an optimization barrier per iteration
    (tools/bwbench.py): a true per-iteration data dependency, no cross-
    iteration fusion, one scalar fetch at the end."""

    def make(x0):
        @jax.jit
        def run(x):
            x = lax.fori_loop(
                0, iters, lambda i, c: lax.optimization_barrier(fn(c)), x
            )
            return jnp.sum(x.astype(jnp.float32))

        return run

    return make


def time_fn(fn, x0, iters=10, reps=3):
    r1, r2 = _chained_runner(fn, iters)(x0), _chained_runner(fn, 2 * iters)(x0)
    float(r1(x0)); float(r2(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(x0))
        t1 = time.perf_counter(); float(r2(x0))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / iters)
    return best


def _requant_i8(y32):
    # int32 accumulator → int8 carry: arithmetic shift + clip (the cheap
    # fixed-point requant a real quantized pipeline uses between layers).
    return jnp.clip(y32 >> 7, -127, 127).astype(jnp.int8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mnk", type=int, default=4096)
    args = ap.parse_args()
    b = args.batch
    rng = np.random.RandomState(0)

    print(f"devices: {jax.devices()}", flush=True)
    results = {}

    # --- matmul capability check ---
    n = args.mnk
    mm_flops = 2.0 * n * n * n
    a_bf = jnp.asarray(rng.randn(n, n), jnp.bfloat16)
    w_bf = jnp.asarray(rng.randn(n, n), jnp.bfloat16)
    a_i8 = jnp.asarray(rng.randint(-127, 128, (n, n)), jnp.int8)
    w_i8 = jnp.asarray(rng.randint(-127, 128, (n, n)), jnp.int8)

    def mm_bf16(c):
        return jnp.dot(c, w_bf, preferred_element_type=jnp.bfloat16).astype(
            jnp.bfloat16
        )

    def mm_i8(c):
        return _requant_i8(jnp.dot(c, w_i8, preferred_element_type=jnp.int32))

    for name, fn, x0 in (("matmul bf16", mm_bf16, a_bf), ("matmul int8", mm_i8, a_i8)):
        dt = time_fn(fn, x0, args.iters)
        results[name] = dt
        print(f"{name:28s} {dt*1e3:8.3f} ms  {mm_flops/dt/1e12:7.1f} TOP/s", flush=True)

    # --- conv at the generator bottleneck shape ---
    h, w, c = 128, 160, 256
    conv_flops = 2.0 * b * h * w * 9 * c * c
    dn = lax.conv_dimension_numbers((b, h, w, c), (3, 3, c, c), ("NHWC", "HWIO", "NHWC"))
    k_bf = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
    k_i8 = jnp.asarray(rng.randint(-127, 128, (3, 3, c, c)), jnp.int8)
    x_bf = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    x_i8 = jnp.asarray(rng.randint(-127, 128, (b, h, w, c)), jnp.int8)

    def conv_bf16(x):
        return lax.conv_general_dilated(
            x, k_bf, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.bfloat16,
        ).astype(jnp.bfloat16)

    def conv_i8(x):
        return _requant_i8(
            lax.conv_general_dilated(
                x, k_i8, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
        )

    def conv_i8_dequant(x):
        y = lax.conv_general_dilated(
            x, k_i8, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        yf = y.astype(jnp.float32) * (1.0 / 128.0)
        return jnp.clip(jnp.round(yf * 0.01), -127, 127).astype(jnp.int8)

    for name, fn, x0 in (
        ("conv3x3 bf16", conv_bf16, x_bf),
        ("conv3x3 int8", conv_i8, x_i8),
        ("conv3x3 int8+f32 dequant", conv_i8_dequant, x_i8),
    ):
        try:
            dt = time_fn(fn, x0, args.iters)
        except Exception as exc:
            print(f"{name:28s} FAILED: {exc!r}", flush=True)
            continue
        results[name] = dt
        print(f"{name:28s} {dt*1e3:8.3f} ms  {conv_flops/dt/1e12:7.1f} TOP/s", flush=True)

    if "conv3x3 bf16" in results and "conv3x3 int8" in results:
        sp = results["conv3x3 bf16"] / results["conv3x3 int8"]
        print(f"\nint8 conv speedup over bf16: {sp:.2f}x "
              f"({'MXU int8 path CONFIRMED' if sp > 1.5 else 'int8 NOT worth it here'})",
              flush=True)


if __name__ == "__main__":
    main()

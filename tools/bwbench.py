"""HBM-bandwidth microbench: what does this chip actually stream, and how
close do the bandwidth-bound stages run to that ceiling?

The fused resblock kernel moves ~2 tensor passes per launch (read x, write
out; stats are noise) at the 512×640 bottleneck shape (16,128,160,256) bf16
= 336 MB/launch. At the measured 4.07 ms/block (2 launches + 1 elementwise
≈ 6 passes = 1.0 GB) that is ~250 GB/s effective against an 819 GB/s v5e
spec — IF a pure stream op reaches ~700+ GB/s here, the kernel has real
headroom and round-4 effort belongs inside the kernel (DMA shape, xcat VMEM
copies, tile size); if the stream op also plateaus low, the kernel is at
the machine's floor and the question is closed.

In-graph chained timing (fori_loop + data dependency + scalar fetch), same
methodology as tools/fwdvariants.py — run SERIALLY on TPU.
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

from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.norm import instance_norm_onepass
from ircolor_tpu.ops.padding import reflect_pad2d


def _chained_runner(fn, x0, iters):
    """Unlike fwdvariants' carry.add(scalar) runner, the carry here IS the
    op output: an elementwise fn otherwise fuses into the in-loop reduce and
    never writes HBM (measured: negative calibrated time). All cases are
    same-shape ops, so carry = fn(carry) is a real per-iteration stream with
    a true data dependency."""

    @jax.jit
    def run(x):
        # The barrier stops XLA from unrolling + fusing the whole chain into
        # one elementwise kernel (measured: 4.4 "TB/s" without it).
        x = lax.fori_loop(
            0, iters, lambda i, c: lax.optimization_barrier(fn(c)), x
        )
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cases", default="")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    b = args.batch
    rng = np.random.RandomState(0)

    def mk(shape, dt=jnp.bfloat16):
        return jnp.asarray(rng.rand(*shape).astype(np.float32) * 2 - 1).astype(dt)

    # The 512×640 generator's bottleneck tensor shape.
    bot = (b, 128, 160, 256)
    k = mk((3, 3, 256, 256)) * 0.05
    nbytes = int(np.prod(bot)) * 2

    cases = {}

    # Pure streams: scale (2 passes). The multiplier must be exactly
    # representable in bf16 (1.0001 rounds to 1.0 → XLA folds the multiply
    # to identity and the loop vanishes; measured 67 "TB/s").
    cases["stream_scale"] = (lambda v: v * 1.0078125, bot, 2 * nbytes)
    cases["stream_scale_4x"] = (
        lambda v: v * 1.0078125, (4 * b, 128, 160, 256), 8 * nbytes)
    cases["stream_f32"] = (
        lambda v: v * 1.0001, None, 4 * nbytes,
        lambda: mk(bot, jnp.float32),
    )

    # The fused kernel at candidate tile sizes (2 passes + stats noise).
    def fused(th):
        from ircolor_tpu.ops.pallas_resblock import conv3x3_reflect_fused

        return lambda v: conv3x3_reflect_fused(v, k, tile_h=th)[0]

    for th in (16, 32, 64):
        cases[f"fused_conv_th{th}"] = (fused(th), bot, 2 * nbytes)

    # XLA comparison points at the same shape.
    cases["xla_conv_same"] = (
        lambda v: conv2d(v, k, padding=((1, 1), (1, 1))), bot, 2 * nbytes)
    cases["xla_pad_conv_in_relu"] = (
        lambda v: jax.nn.relu(
            instance_norm_onepass(conv2d(reflect_pad2d(v, 1), k, padding="VALID"))
        ),
        bot, 2 * nbytes)

    sel = args.cases.split(",") if args.cases else list(cases)
    for name in sel:
        entry = cases[name]
        fn, shape, traffic = entry[0], entry[1], entry[2]
        x0 = entry[3]() if len(entry) > 3 else mk(shape)
        t = time_fn(fn, x0, iters=args.iters)
        gbps = traffic / t / 1e9
        print(f"{name:22s} {t * 1e3:8.3f} ms  {gbps:7.1f} GB/s (counted)", flush=True)


if __name__ == "__main__":
    main()

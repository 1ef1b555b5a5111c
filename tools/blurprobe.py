"""What does XLA actually do with the banded-constant einsum blur?

The matmul blur (ops/linops.py) measures 6.4 ms at 16×512×640×128 — dense
dot FLOPs would take ~1.8 s at MXU peak, so XLA must be rewriting it.
This dumps the optimized HLO op breakdown and re-measures the depthwise
formulation with honest in-graph timing. Run SERIALLY on TPU.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import collections
import re
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", _os.path.expanduser("~/.cache/jax_comp_cache")
)

from ircolor_tpu.ops.blurpool import blur_downsample
from ircolor_tpu.ops.conv import depthwise_conv2d
from ircolor_tpu.ops.filters import binomial_filter_2d
from ircolor_tpu.ops.padding import pad2d


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
    r1, r2 = _chained_runner(fn, x0, iters), _chained_runner(fn, x0, 2 * iters)
    float(r1(x0)); float(r2(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(x0))
        t1 = time.perf_counter(); float(r2(x0))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / iters)
    return best


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(16, 512, 640, 128).astype(np.float32) * 2 - 1).astype(jnp.bfloat16)

    lowered = jax.jit(blur_downsample).lower(x)
    hlo = lowered.compile().as_text()
    ops = collections.Counter(
        m.group(1)
        for m in re.finditer(r"=\s+\S+\s+(\w+)\(", hlo)
    )
    print("optimized HLO op histogram (blur_downsample matmul form):")
    for name, n in ops.most_common(12):
        print(f"  {name:24s} {n}")

    def blur_depthwise(v):
        y = pad2d(v, (1, 1, 1, 1), "reflect")
        return depthwise_conv2d(y, binomial_filter_2d(3), stride=2, padding="VALID")

    t = stage_time(blur_downsample, x)
    print(f"blur matmul form      {t*1e3:8.2f} ms", flush=True)
    t = stage_time(blur_depthwise, x)
    print(f"blur depthwise form   {t*1e3:8.2f} ms", flush=True)

    from ircolor_tpu.ops.pallas_blur import blur_downsample_pallas

    ref = np.asarray(blur_downsample(x).astype(jnp.float32))
    got = np.asarray(blur_downsample_pallas(x).astype(jnp.float32))
    print(f"pallas blur max|Δ| vs matmul: {np.abs(ref-got).max():.2e}", flush=True)
    t = stage_time(blur_downsample_pallas, x)
    print(f"blur PALLAS kernel    {t*1e3:8.2f} ms", flush=True)

    x2 = jnp.asarray(
        np.random.RandomState(2).rand(16, 256, 320, 256).astype(np.float32) * 2 - 1
    ).astype(jnp.bfloat16)
    t = stage_time(blur_downsample, x2)
    print(f"blur matmul 256x320x256 {t*1e3:6.2f} ms", flush=True)
    t = stage_time(blur_downsample_pallas, x2)
    print(f"blur PALLAS 256x320x256 {t*1e3:6.2f} ms", flush=True)


def resblock_variants():
    """Honest in-graph: resblock with materialized reflect pads vs the
    border-corrected zero-SAME formulation (ops.conv.conv3x3_reflect)."""
    from ircolor_tpu.ops.conv import conv2d, conv3x3_reflect
    from ircolor_tpu.ops.norm import instance_norm
    from ircolor_tpu.ops.padding import reflect_pad2d

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(16, 128, 160, 256).astype(np.float32) * 2 - 1).astype(jnp.bfloat16)
    k1 = jnp.asarray(rng.randn(3, 3, 256, 256).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    k2 = jnp.asarray(rng.randn(3, 3, 256, 256).astype(np.float32) * 0.05).astype(jnp.bfloat16)

    def block_pad(v):
        r = jax.nn.relu(instance_norm(conv2d(reflect_pad2d(v, 1), k1, padding="VALID")))
        return v + instance_norm(conv2d(reflect_pad2d(r, 1), k2, padding="VALID"))

    def block_reflectconv(v):
        r = jax.nn.relu(instance_norm(conv3x3_reflect(v, k1)))
        return v + instance_norm(conv3x3_reflect(r, k2))

    for name, fn in (("block pad", block_pad), ("block reflectconv", block_reflectconv)):
        t = stage_time(fn, x)
        print(f"{name:22s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
    resblock_variants()

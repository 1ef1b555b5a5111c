"""Op-level TPU microbenchmarks for the generator's hot shapes.

Times each structural op of the 512×640 generator in isolation (chained
iterations + scalar fetch, so execution — not dispatch — is measured) and
reports achieved TFLOP/s / GB/s. Drives the Pallas/XLA optimization
decisions (SURVEY.md §7.1 step 9: only keep kernels that win).

Usage: python tools/microbench.py [--batch 8] [--dtype bf16]
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

from ircolor_tpu.ops.blurpool import blur_downsample, blur_upsample_aa
from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.norm import instance_norm


def timeit(fn, *args, iters=8):
    """Median wall time of fn(*args) with chained scalar-fetch semantics."""
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        s = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(s.astype(jnp.float32)))  # host fetch forces completion
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = p.parse_args()
    b = args.batch
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.RandomState(0)

    def mk(shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(dt)

    cases = []
    # (name, x_shape, kernel_shape, stride, flops)
    conv_cases = [
        ("inc 7x7 1→64 @512x640", (b, 518, 646, 1), (7, 7, 1, 64), 1),
        ("down1 3x3 64→128 @512x640", (b, 514, 642, 64), (3, 3, 64, 128), 1),
        ("down2 3x3 128→256 @256x320", (b, 258, 322, 128), (3, 3, 128, 256), 1),
        ("resblock 3x3 256→256 @128x160", (b, 130, 162, 256), (3, 3, 256, 256), 1),
        ("up1 3x3 384→128 @256x320", (b, 258, 322, 384), (3, 3, 384, 128), 1),
        ("up2 3x3 192→64 @512x640", (b, 514, 642, 192), (3, 3, 192, 64), 1),
        ("outc 7x7 64→3 @512x640", (b, 518, 646, 64), (7, 7, 64, 3), 1),
    ]
    for name, xs, ks, stride in conv_cases:
        x = mk(xs)
        k = mk(ks)
        f = jax.jit(lambda x, k: conv2d(x, k, stride=stride, padding="VALID"))
        t = timeit(f, x, k)
        oh, ow = xs[1] - ks[0] + 1, xs[2] - ks[1] + 1
        flops = 2 * b * oh * ow * ks[0] * ks[1] * ks[2] * ks[3]
        print(f"{name:36s} {t*1e3:8.2f} ms  {flops/t/1e12:7.2f} TFLOP/s")

    # Bandwidth-bound ops.
    bw_cases = [
        ("instance_norm @512x640x64", (b, 512, 640, 64), jax.jit(instance_norm)),
        ("instance_norm @128x160x256", (b, 128, 160, 256), jax.jit(instance_norm)),
        ("blur_down @512x640x128", (b, 512, 640, 128), jax.jit(blur_downsample)),
        ("blur_up @128x160x256", (b, 128, 160, 256), jax.jit(blur_upsample_aa)),
        ("relu @512x640x128", (b, 512, 640, 128), jax.jit(jax.nn.relu)),
    ]
    for name, xs, f in bw_cases:
        x = mk(xs)
        t = timeit(f, x)
        nbytes = np.prod(xs) * (2 if args.dtype == "bf16" else 4)
        print(f"{name:36s} {t*1e3:8.2f} ms  {2*nbytes/t/1e9:7.1f} GB/s (r+w est)")

    # Whole generator for reference.
    from ircolor_tpu.config import Config
    from ircolor_tpu.models.wrapper import generator_from_config

    cfg = Config(img_height=512, img_width=640, compute_dtype=args.dtype)
    module = generator_from_config(cfg)
    ir = mk((b, 512, 640, 1)).astype(jnp.float32)
    params = module.init(jax.random.PRNGKey(0), ir[:1])["params"]
    f = jax.jit(lambda p, x: module.apply({"params": p}, x))
    t = timeit(f, params, ir, iters=4)
    print(f"{'FULL GENERATOR':36s} {t*1e3:8.2f} ms  {b/t:7.1f} fps  ({0.685*b/t:.1f} TFLOP/s eff)")


if __name__ == "__main__":
    main()

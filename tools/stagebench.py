"""Per-stage generator timing at the flagship shape (512×640 bf16).

Methodology (axon-relay-safe, CLAUDE.md): each stage runs inside a
``lax.fori_loop`` with a real data dependency between iterations (a scalar
derived from the output is folded into one element of the carried input), so
iterations can't overlap or fold; wall time is differenced between N and 2N
iteration executables to cancel fixed dispatch/RPC cost. This is the ground
truth the knockout table (tools/knockout.py) approximates non-additively.

Run SERIALLY on the TPU. First run compiles 2 executables per stage
(~persistent-cached afterwards).

Usage: python tools/stagebench.py [--batch 16] [--iters 12] [--stages a,b,...]
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

from ircolor_tpu.ops.blurpool import blur_downsample, blur_upsample_aa
from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.norm import instance_norm
from ircolor_tpu.ops.padding import reflect_pad2d

DT = jnp.bfloat16


def _chained_runner(fn, x0, iters):
    @jax.jit
    def run(x):
        def body(i, carry):
            y = fn(carry)
            s = (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(carry.dtype)
            idx = (0,) * carry.ndim
            return carry.at[idx].add(s)

        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(x.astype(jnp.float32))

    return run


def stage_time(name, fn, x0, iters=12, reps=3):
    """Per-iteration seconds via (2N − N)/N differencing."""
    r1 = _chained_runner(fn, x0, iters)
    r2 = _chained_runner(fn, x0, 2 * iters)
    float(r1(x0))  # compile + warm
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


def make_params(rng, ngf=64):
    def w(kh, kw, ci, co):
        return jnp.asarray(rng.randn(kh, kw, ci, co).astype(np.float32) * 0.05).astype(DT)

    return {
        "inc": w(7, 7, 1, ngf),
        "d1": w(3, 3, ngf, 2 * ngf),
        "d2": w(3, 3, 2 * ngf, 4 * ngf),
        "res": [
            (w(3, 3, 4 * ngf, 4 * ngf), w(3, 3, 4 * ngf, 4 * ngf)) for _ in range(9)
        ],
        "u1": w(3, 3, 6 * ngf, 2 * ngf),
        "u2": w(3, 3, 3 * ngf, ngf),
        "out": w(7, 7, ngf, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--stages", default="")
    args = ap.parse_args()
    b = args.batch
    rng = np.random.RandomState(0)
    p = make_params(rng)

    def mk(*shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32) * 2 - 1).astype(DT)

    def resblock(h, k1, k2):
        r = jax.nn.relu(instance_norm(conv2d(reflect_pad2d(h, 1), k1, padding="VALID")))
        return h + instance_norm(conv2d(reflect_pad2d(r, 1), k2, padding="VALID"))

    def res_chain(h):
        for k1, k2 in p["res"]:
            h = resblock(h, k1, k2)
        return h

    def one_block(h):
        return resblock(h, *p["res"][0])

    def conv_only_chain(h):
        # The 18 convs alone (zero-SAME, no IN/pad/residual): MXU floor.
        for k1, k2 in p["res"]:
            h = conv2d(conv2d(h, k1, padding=((1, 1), (1, 1))), k2, padding=((1, 1), (1, 1)))
        return h

    stages = {
        # encoder
        "inc": (
            lambda x: jax.nn.relu(instance_norm(conv2d(reflect_pad2d(x, 3), p["inc"], padding="VALID"))),
            (b, 512, 640, 1),
        ),
        "down1_conv": (
            lambda x: jax.nn.relu(instance_norm(conv2d(x, p["d1"], padding=((1, 1), (1, 1))))),
            (b, 512, 640, 64),
        ),
        "down1_blur": (blur_downsample, (b, 512, 640, 128)),
        "down2_conv": (
            lambda x: jax.nn.relu(instance_norm(conv2d(x, p["d2"], padding=((1, 1), (1, 1))))),
            (b, 256, 320, 128),
        ),
        "down2_blur": (blur_downsample, (b, 256, 320, 256)),
        # bottleneck
        "res_chain_x9": (res_chain, (b, 128, 160, 256)),
        "res_block_x1": (one_block, (b, 128, 160, 256)),
        "res_convs_only_x18": (conv_only_chain, (b, 128, 160, 256)),
        # decoder (skip convs measured on their blurred input; the concat-free
        # split is inside the model, here approximated with full-width conv)
        "up1_blur": (blur_upsample_aa, (b, 128, 160, 256)),
        "up1_conv": (
            lambda x: jax.nn.relu(instance_norm(conv2d(x, p["u1"], padding=((1, 1), (1, 1))))),
            (b, 256, 320, 384),
        ),
        "up2_blur": (blur_upsample_aa, (b, 256, 320, 128)),
        "up2_conv": (
            lambda x: jax.nn.relu(instance_norm(conv2d(x, p["u2"], padding=((1, 1), (1, 1))))),
            (b, 512, 640, 192),
        ),
        "outc": (
            lambda x: jnp.tanh(conv2d(reflect_pad2d(x, 3), p["out"], padding="VALID")),
            (b, 512, 640, 64),
        ),
        # isolated op classes at the bottleneck shape
        "in_bottleneck": (instance_norm, (b, 128, 160, 256)),
        "pad_bottleneck": (lambda x: reflect_pad2d(x, 1) * 1.0, (b, 128, 160, 256)),
    }

    want = [s for s in args.stages.split(",") if s] or list(stages)
    total = 0.0
    for name in want:
        fn, shape = stages[name]
        x0 = mk(*shape)
        t = stage_time(name, fn, x0, iters=args.iters)
        total += t
        print(f"{name:22s} {t*1e3:8.2f} ms  ({t*1e3/b:6.3f} ms/frame)", flush=True)
    print(f"{'SUM':22s} {total*1e3:8.2f} ms  ({b/total:7.1f} fps-equivalent)")


if __name__ == "__main__":
    main()

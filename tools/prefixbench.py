"""Cumulative-prefix timing of the exact generator forward (--batch/--height/--width, default b16 512×640).

Isolated stage timings (tools/stagebench.py) don't add up to the full graph
— XLA schedules/fuses differently in context. Timing prefixes of the real
composition and differencing adjacent prefixes attributes wall time
in-context. Uses the same ops the model uses (round-2 shipped config:
depthwise down-blur, matmul up-blur, lane-packing only at outc, one-pass
IN stats, concat-free skip convs). Run SERIALLY on TPU.
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

from ircolor_tpu.ops.blurpool import blur_downsample, blur_upsample_aa
from ircolor_tpu.ops.conv import conv2d, conv2d_lanepack
from ircolor_tpu.ops.norm import instance_norm_onepass as instance_norm
from ircolor_tpu.ops.padding import reflect_pad2d

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=16)
_ap.add_argument("--height", type=int, default=512)
_ap.add_argument("--width", type=int, default=640)
_args, _ = _ap.parse_known_args()

DT = jnp.bfloat16
B = _args.batch
H, W = _args.height, _args.width


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


def stage_time(fn, x0, iters=10, reps=3):
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

    def inr(v):
        return jax.nn.relu(instance_norm(v))

    def stages(v, upto):
        steps = []
        x0 = x1 = None

        def s_inc(v):
            nonlocal x0
            x0 = inr(conv2d(reflect_pad2d(v.astype(DT), 3), p["inc"], padding="VALID"))
            return x0

        def s_d1(v):
            nonlocal x1
            x1 = blur_downsample(inr(conv2d(v, p["d1"], padding=((1, 1), (1, 1)))))
            return x1

        def s_d2(v):
            return blur_downsample(inr(conv2d(v, p["d2"], padding=((1, 1), (1, 1)))))

        def s_res(v):
            h = v
            for k1, k2 in p["res"]:
                r = inr(conv2d(reflect_pad2d(h, 1), k1, padding="VALID"))
                h = h + instance_norm(conv2d(reflect_pad2d(r, 1), k2, padding="VALID"))
            return h

        def s_up1(v):
            y = blur_upsample_aa(v)
            ca = y.shape[-1]
            y2 = conv2d(y, p["u1"][:, :, :ca], padding=((1, 1), (1, 1))) + conv2d(
                x1, p["u1"][:, :, ca:], padding=((1, 1), (1, 1))
            )
            return inr(y2)

        def s_up2(v):
            y = blur_upsample_aa(v)
            ca = y.shape[-1]
            y2 = conv2d(y, p["u2"][:, :, :ca], padding=((1, 1), (1, 1))) + conv2d(
                x0, p["u2"][:, :, ca:], padding=((1, 1), (1, 1))
            )
            return inr(y2)

        def s_out(v):
            return jnp.tanh(
                conv2d_lanepack(reflect_pad2d(v, 3), p["out"], 32, padding="VALID")
            )

        steps = [("inc", s_inc), ("down1", s_d1), ("down2", s_d2),
                 ("res×9", s_res), ("up1", s_up1), ("up2", s_up2), ("outc", s_out)]
        for name, f in steps[:upto]:
            v = f(v)
        return v

    ir = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) * 2 - 1)
    names = ["inc", "down1", "down2", "res×9", "up1", "up2", "outc"]
    prev = 0.0
    for i in range(1, len(names) + 1):
        t = stage_time(lambda v, i=i: stages(v, i), ir)
        print(f"prefix≤{names[i-1]:6s} {t*1e3:8.2f} ms  (Δ {((t-prev)*1e3):+7.2f} ms)",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()

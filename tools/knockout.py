"""Knockout profiling of the generator at 512×640.

Times generator variants with one op class neutralized (instance norm →
identity, blur-pool → strided slice / plain resize, reflect pads → zero
pads, resblocks removed, ...) to attribute wall time without a device
profiler (the axon relay doesn't expose one). Deltas vs the full model give
the per-op-class cost. Run SERIALLY (see CLAUDE.md).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ircolor_tpu.ops.blurpool import blur_downsample, blur_upsample_aa
from ircolor_tpu.ops.norm import instance_norm
from ircolor_tpu.ops.padding import reflect_pad2d
from ircolor_tpu.ops.resize import bilinear_align_corners


def build_generator(variant: str, ngf=64, n_blocks=9, dtype=jnp.bfloat16):
    """A functional generator with the given knockout variant."""

    use_in = variant != "no_in"
    use_blur = variant != "no_blur"
    use_reflect = variant != "no_reflect"
    blocks = 0 if variant == "no_resblocks" else n_blocks

    def norm(x):
        return instance_norm(x) if use_in else x

    def pad(x, p):
        if use_reflect:
            return reflect_pad2d(x, p)
        return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))

    def down(x):
        if use_blur:
            return blur_downsample(x)
        return x[:, ::2, ::2, :]

    def up(x):
        if use_blur:
            return blur_upsample_aa(x)
        b, h, w, c = x.shape
        return bilinear_align_corners(x, (2 * h, 2 * w))

    def conv(x, k, stride=1, padding="VALID"):
        return lax.conv_general_dilated(
            x, k.astype(dtype), (stride, stride), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    rng = np.random.RandomState(0)

    def w(kh, kw, ci, co):
        return jnp.asarray(rng.randn(kh, kw, ci, co).astype(np.float32) * 0.02)

    params = {
        "inc": w(7, 7, 1, ngf),
        "d1": w(3, 3, ngf, ngf * 2),
        "d2": w(3, 3, ngf * 2, ngf * 4),
        "res": [(w(3, 3, ngf * 4, ngf * 4), w(3, 3, ngf * 4, ngf * 4)) for _ in range(n_blocks)],
        "u1": w(3, 3, ngf * 6, ngf * 2),
        "u2": w(3, 3, ngf * 3, ngf),
        "out": w(7, 7, ngf, 3),
    }

    def fwd(p, x):
        x = x.astype(dtype)
        x0 = jax.nn.relu(norm(conv(pad(x, 3), p["inc"])))
        x1 = jax.nn.relu(norm(conv(x0, p["d1"], padding=((1, 1), (1, 1)))))
        x1 = down(x1)
        x2 = jax.nn.relu(norm(conv(x1, p["d2"], padding=((1, 1), (1, 1)))))
        x2 = down(x2)
        h = x2
        for k1, k2 in p["res"][:blocks]:
            r = jax.nn.relu(norm(conv(pad(h, 1), k1)))
            h = h + norm(conv(pad(r, 1), k2))
        y = up(h)
        y = jnp.concatenate([y, x1], axis=-1)
        y = jax.nn.relu(norm(conv(y, p["u1"], padding=((1, 1), (1, 1)))))
        y = up(y)
        y = jnp.concatenate([y, x0], axis=-1)
        y = jax.nn.relu(norm(conv(y, p["u2"], padding=((1, 1), (1, 1)))))
        return jnp.tanh(conv(pad(y, 3), p["out"]))

    return params, fwd


def bench(variant: str, batch=16, h=512, w=640, iters=5) -> float:
    params, fwd = build_generator(variant)
    x = jnp.asarray(np.random.RandomState(1).rand(batch, h, w, 1).astype(np.float32) * 2 - 1)
    f = jax.jit(lambda p, x: jnp.sum(fwd(p, x).astype(jnp.float32)))
    s = float(f(params, x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = float(f(params, x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    variants = ["full", "no_in", "no_blur", "no_reflect", "no_resblocks"]
    base = None
    for v in variants:
        t = bench(v)
        if v == "full":
            base = t
        delta = base - t
        print(f"{v:14s} {t*1e3:8.1f} ms  (delta vs full: {delta*1e3:+7.1f} ms)", flush=True)


if __name__ == "__main__":
    main()

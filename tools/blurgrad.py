"""Blur-pool BACKWARD A/B: XLA's dilated-depthwise gradient conv vs a
transposed banded-matmul VJP.

The enc/dec backward attribution (tools/gradbench.py g_noblocks_noaa:
−34.6 ms of the 148.8 ms enc/dec fwd+bwd at b8 512×640) points at the
anti-aliasing path. The down-blur ships as an honest pad+depthwise conv
(the in-context forward winner); its autodiff backward is a depthwise
conv with lhs_dilation=2 over the cotangent plus a reflect-pad VJP —
exactly the op family TPUs run on the VPU, not the MXU. Since the blur
is LINEAR, its VJP is the transposed operator, available in closed form
as the per-axis banded matrices of ops/linops.py: dx = A_hᵀ · dy · A_w.

Variants (each timed as grad-of-scalar through the op, chained in-graph):

* down_dw      — shipped: pad reflect + depthwise stride 2, XLA autodiff
* down_mm      — matmul form fwd, autodiff (VJP = transposed matmuls)
* down_hybrid  — custom_vjp: depthwise fwd, transposed-matmul bwd
* up_mm        — shipped up path (matmul), autodiff — reference point
* fwd-only rows for each down form (to split fwd/bwd shares)

Run SERIALLY on TPU: python tools/blurgrad.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", _os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ircolor_tpu.ops.blurpool import blur_downsample, blur_upsample_aa
from ircolor_tpu.utils.timing import start_transfer_warmup, time_chained_fn

DT = jnp.bfloat16


# Shared chained-timing harness (single source of truth):
# ircolor_tpu/utils/timing.py:time_chained_fn.
def time_fn(fn, x0, iters=12, reps=3):
    return time_chained_fn(fn, x0, iters=iters, reps=reps)


def blur_down_hybrid(x: jnp.ndarray) -> jnp.ndarray:
    """Depthwise forward, transposed-banded-matmul backward (exact: the op
    is linear, so its VJP is the transpose of the same operator the matmul
    form applies — built in f64 and applied at the op dtype)."""
    from ircolor_tpu.ops.linops import apply_axis_ops, blur_matrix

    _, h, w, _ = x.shape
    m_h = blur_matrix(h, 3, 2, "reflect", 0)
    m_w = blur_matrix(w, 3, 2, "reflect", 0)

    @jax.custom_vjp
    def f(x):
        return blur_downsample(x)

    def fwd(x):
        return blur_downsample(x), None

    def bwd(_, dy):
        return (apply_axis_ops(dy, m_h.T, m_w.T),)

    f.defvjp(fwd, bwd)
    return f(x)


def grad_of(fn, ct):
    def loss(x):
        return jnp.sum((fn(x) * ct).astype(jnp.float32))

    return jax.jit(jax.grad(loss))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=12)
    args = p.parse_args()
    start_transfer_warmup()
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    b = args.batch

    for (h, w, c), tag in (((512, 640, 128), "down1"), ((256, 320, 256), "down2")):
        x = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32) * 2 - 1).astype(DT)
        ct = jnp.asarray(rng.randn(b, h // 2, w // 2, c).astype(np.float32)).astype(DT)
        fns = {
            "fwd_dw": lambda x: blur_downsample(x).astype(x.dtype),
            "fwd_mm": lambda x: blur_downsample(x, use_matmul=True).astype(x.dtype),
            "grad_dw": grad_of(blur_downsample, ct),
            "grad_mm": grad_of(lambda x: blur_downsample(x, use_matmul=True), ct),
            "grad_hybrid": grad_of(blur_down_hybrid, ct),
        }
        # fwd rows must keep output shape == input shape for chaining: blur
        # halves H/W, so wrap with a broadcast-back (costs one elementwise
        # pass, identical across variants — deltas still attribute).
        for name, fn in fns.items():
            if name.startswith("fwd"):
                g = fn

                def wrapped(x, g=g):
                    y = g(x)
                    return x + jnp.pad(
                        y, ((0, 0), (0, h - h // 2), (0, w - w // 2), (0, 0))
                    ).astype(x.dtype)

                fn = wrapped
            dt = time_fn(fn, x, iters=args.iters)
            print(f"{tag} {name:12s} {dt * 1e3:8.3f} ms", flush=True)

    # up path reference point (shipped matmul form), bottleneck→up1 shape
    h, w, c = 128, 160, 256
    x = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32) * 2 - 1).astype(DT)
    ct = jnp.asarray(
        rng.randn(b, h * 2, w * 2, c).astype(np.float32)
    ).astype(DT)
    dt = time_fn(grad_of(blur_upsample_aa, ct), x, iters=args.iters)
    print(f"up1   grad_mm      {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Per-segment A/B of the enc/dec fused backward (ops/pallas_encdec.py)
vs XLA autodiff of the identical conv+IN+ReLU segment, isolated per site
(down1/down2/up1 shapes at b8 512×640) with a tile_h sweep.

The step-level trainbench encdec_bwd variant measures the composite; this
attributes WHICH segment wins/loses and at what tile, with the in-graph
chained methodology (utils/timing.py:time_chained_fn). Run SERIALLY.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  _os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time

from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.norm import instance_norm_onepass
from ircolor_tpu.ops.pallas_encdec import conv_in_relu_fused
from ircolor_tpu.utils.timing import start_transfer_warmup


def time_chained_multi(body, x0, consts, iters: int, reps: int = 3) -> float:
    """time_chained_fn's 2N−N difference methodology, with the big operand
    tensors passed as ARGUMENTS instead of closure constants — a closed-over
    (B,512,640,C) cotangent becomes an HLO literal and blows the relay's
    remote-compile body limit (HTTP 413, first seen on the round-3 blurgrad
    up1 row)."""

    def chained(it):
        @jax.jit
        def run(x, *cs):
            def loop(_, carry):
                y = body(carry, *cs)
                s = (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(carry.dtype)
                return carry.at[(0,) * carry.ndim].add(s)

            x = jax.lax.fori_loop(0, it, loop, x)
            return jnp.sum(x.astype(jnp.float32))

        return run

    r1, r2 = chained(iters), chained(2 * iters)
    float(r1(x0, *consts)); float(r2(x0, *consts))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(x0, *consts))
        t1 = time.perf_counter(); float(r2(x0, *consts))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / iters)
    return best


def ref_segment(zs, k):
    z = zs[0] if len(zs) == 1 else jnp.concatenate(zs, axis=-1)
    raw = conv2d(z, k, padding=((1, 1), (1, 1)))
    return jax.nn.relu(instance_norm_onepass(raw))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--tiles", default="8,16,32")
    ap.add_argument("--sites", default="down1,down2,up1")
    args = ap.parse_args()
    b = args.batch

    start_transfer_warmup().join()
    dt = jnp.bfloat16

    SITES = {
        # name: (input shapes, cout, fused wgrad mode)
        "down1": (((b, 512, 640, 64),), 128, "xla"),
        "down2": (((b, 256, 320, 128),), 256, "fused"),
        "up1": (((b, 256, 320, 256), (b, 256, 320, 128)), 128, "fused"),
    }
    rng = np.random.RandomState(0)
    for name in args.sites.split(","):
        shapes, cout, wmode = SITES[name]
        zs = tuple(jnp.asarray(rng.randn(*s).astype(np.float32)).astype(dt)
                   for s in shapes)
        cin = sum(s[-1] for s in shapes)
        k = jnp.asarray((rng.randn(3, 3, cin, cout) * 0.05).astype(np.float32)).astype(dt)
        cot = jnp.asarray(rng.randn(*shapes[0][:3], cout).astype(np.float32)).astype(dt)

        consts = zs[1:] + (k, cot)

        def make_body(seg):
            def scalar_loss(z0, k_, *rest_and_cot):
                rest, cot_ = rest_and_cot[:-1], rest_and_cot[-1]
                zs_ = (z0,) + rest
                return jnp.sum(
                    seg(zs_, k_).astype(jnp.float32) * cot_.astype(jnp.float32)
                )

            def body(z0, *cs):
                rest, k_, cot_ = cs[:-2], cs[-2], cs[-1]
                dz, dk = jax.grad(scalar_loss, argnums=(0, 1))(
                    z0, k_, *rest, cot_
                )
                # fold dk in via a scalar so the wgrad is not DCE'd
                return dz + (jnp.sum(dk.astype(jnp.float32)) * 1e-24).astype(dz.dtype)

            return body

        sec = time_chained_multi(make_body(ref_segment), zs[0], consts, args.iters)
        print(f"{name:6s} xla-autodiff      {sec * 1e3:7.2f} ms", flush=True)
        for th in (int(t) for t in args.tiles.split(",")):
            if shapes[0][1] % th:
                continue
            seg = lambda zs_, k_, th=th: conv_in_relu_fused(wmode, th, False, zs_, k_)
            try:
                sec = time_chained_multi(make_body(seg), zs[0], consts, args.iters)
                print(f"{name:6s} fused th={th:<3d} ({wmode}) {sec * 1e3:7.2f} ms",
                      flush=True)
            except Exception as exc:  # noqa: BLE001 — keep the sweep going
                print(f"{name:6s} fused th={th:<3d} FAILED {type(exc).__name__}: "
                      f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()

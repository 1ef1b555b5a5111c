"""Lane-packing sweep for the small-Cout convs (outc 7×7→3, up2 3×3→64).

In-graph chained timing (see tools/stagebench.py). Run SERIALLY on TPU.
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

from ircolor_tpu.ops.conv import conv2d, conv2d_lanepack
from ircolor_tpu.ops.padding import reflect_pad2d

DT = jnp.bfloat16
B = 16


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

    def mk(*s):
        return jnp.asarray(rng.rand(*s).astype(np.float32) * 2 - 1).astype(DT)

    # --- outc: reflect-pad3 + 7×7 64→3 + tanh @512×640 ---
    x = mk(B, 512, 640, 64)
    k7 = mk(7, 7, 64, 3)
    b3 = mk(3)

    def outc_plain(v):
        return jnp.tanh(conv2d(reflect_pad2d(v, 3), k7, padding="VALID") + b3)

    t = stage_time(outc_plain, x)
    print(f"outc plain            {t*1e3:8.2f} ms", flush=True)
    for p in (8, 16, 32, 64):
        def outc_lp(v, p=p):
            return jnp.tanh(conv2d_lanepack(reflect_pad2d(v, 3), k7, p,
                                            padding="VALID", bias=b3))
        t = stage_time(outc_lp, x)
        print(f"outc lanepack p={p:<3d}   {t*1e3:8.2f} ms", flush=True)

    # --- up2-style conv: 3×3 192→64 SAME @512×640 ---
    x2 = mk(B, 512, 640, 192)
    k3 = mk(3, 3, 192, 64)
    b64 = mk(64)

    def up2_plain(v):
        return conv2d(v, k3, padding=((1, 1), (1, 1))) + b64

    t = stage_time(up2_plain, x2)
    print(f"up2 plain             {t*1e3:8.2f} ms", flush=True)
    for p in (2, 4):
        def up2_lp(v, p=p):
            return conv2d_lanepack(v, k3, p, bias=b64)
        t = stage_time(up2_lp, x2)
        print(f"up2 lanepack p={p:<3d}    {t*1e3:8.2f} ms", flush=True)

    # --- inc: reflect-pad3 + 7×7 1→64 @512×640 (Cin=1; for reference) ---
    xi = mk(B, 512, 640, 1)
    ki = mk(7, 7, 1, 64)

    def inc_plain(v):
        return conv2d(reflect_pad2d(v, 3), ki, padding="VALID")

    t = stage_time(inc_plain, xi)
    print(f"inc plain (conv only) {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""VGG perceptual tower fwd+bwd A/B: SelectAndScatter pool backward vs the
scatter-free first-max pool (ops/pooling.py).

The loss-term knockouts put the whole perceptual term at 38.8 ms of the
247.9 ms b8 512×640 train step (docs/PERF.md). The tower's backward is
dgrad-only (frozen weights → wgrads pruned); besides the 8 conv dgrads it
pays two max-pool VJPs, the first at the full (b,512,640,64) plane — XLA
lowers those to SelectAndScatter. This times grad-through-tower with both
pool implementations, plus fwd-only rows.

Run SERIALLY on TPU: python tools/vgggrad.py [--batch 8]
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

from ircolor_tpu.losses.vgg import VGG16Features, init_vgg16_params
from ircolor_tpu.utils.timing import start_transfer_warmup, time_chained_fn

DT = jnp.bfloat16


# Shared chained-timing harness (single source of truth):
# ircolor_tpu/utils/timing.py:time_chained_fn.
def time_fn(fn, x0, iters=8, reps=3):
    return time_chained_fn(fn, x0, iters=iters, reps=reps)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    start_transfer_warmup()
    print(f"devices: {jax.devices()}", flush=True)

    rng = np.random.RandomState(0)
    b, h, w = args.batch, args.height, args.width
    x = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 2 - 1).astype(DT)
    params = jax.tree.map(
        lambda v: v.astype(DT), init_vgg16_params()
    )
    ct = None

    for fast in (False, True):
        mod = VGG16Features(dtype=DT, fast_pool=fast)
        feats = jax.eval_shape(lambda x: mod.apply({"params": params}, x), x)
        if ct is None:
            ct = jnp.asarray(
                rng.randn(*feats.shape).astype(np.float32)
            ).astype(DT)

        def fwd(x, mod=mod):
            y = mod.apply({"params": params}, x)
            # keep chain shape: fold a scalar back into x
            s = (jnp.sum((y * ct).astype(jnp.float32)) * 1e-12).astype(x.dtype)
            return x + s

        def gradfn(x, mod=mod):
            def loss(x):
                y = mod.apply({"params": params}, x)
                return jnp.sum((y * ct).astype(jnp.float32))

            return jax.grad(loss)(x)

        tag = "fast" if fast else "xla "
        dt = time_fn(fwd, x, iters=args.iters)
        print(f"fwd_{tag}  {dt * 1e3:8.3f} ms", flush=True)
        dt = time_fn(jax.jit(gradfn), x, iters=args.iters)
        print(f"grad_{tag} {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()

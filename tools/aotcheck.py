"""TPU validation for the keep_pallas AOT serving artifact.

Exports the SHIPPED inference graph (fused resblocks + nb/head kernels,
optionally int8 fused blocks with --quant-int8) via
``export_inference(keep_pallas=True)``, reloads it, and checks:

1. the artifact executes on this TPU (Mosaic custom calls run after a
   serialize/deserialize round trip);
2. uint8 outputs match the live jitted module (bf16 reassociation noise
   budget: ≤8/255, the round-2 measured bound for reloaded artifacts);
3. steady-state throughput of the loaded artifact (chained in-graph style:
   each call consumes the previous output's derived scalar so the relay
   cannot overlap dispatches).

Run SERIALLY on the TPU (CLAUDE.md relay rules).
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", _os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ircolor_tpu.config import Config
from ircolor_tpu.export.aot import export_inference
from ircolor_tpu.models.wrapper import generator_from_config
from ircolor_tpu.utils.timing import start_transfer_warmup


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--quant-int8", action="store_true")
    args = p.parse_args()

    start_transfer_warmup()
    cfg = Config(
        img_height=args.height, img_width=args.width, compute_dtype="bf16",
        quant_int8=args.quant_int8,
    )
    module = generator_from_config(cfg)
    print(f"module: pallas_block={module.pallas_block} "
          f"nb={module.pallas_norm_blur} head={module.pallas_head} "
          f"quant={module.quant_int8}", flush=True)
    rng = np.random.RandomState(0)
    ir = jnp.asarray(
        rng.rand(args.batch, args.height, args.width, 1).astype(np.float32) * 2 - 1
    )
    params = module.init(jax.random.PRNGKey(0), ir[:1])["params"]

    from ircolor_tpu.eval.metrics import quantize_to_uint8_01

    @jax.jit
    def live(ir):
        fake = module.apply({"params": params}, ir, train=False)
        return (quantize_to_uint8_01((fake + 1.0) / 2.0) * 255.0).astype(jnp.uint8)

    t0 = time.perf_counter()
    want = np.asarray(live(ir))
    print(f"live fwd+quant done ({time.perf_counter()-t0:.1f}s incl compile)",
          flush=True)

    t0 = time.perf_counter()
    blob = export_inference(
        module, params, args.height, args.width, batch_size=args.batch,
        platforms=("tpu",), keep_pallas=True,
    )
    from ircolor_tpu.export.aot import artifact_has_tpu_kernels

    has_kernels = artifact_has_tpu_kernels(blob)
    print(f"exported {len(blob)/1e6:.1f} MB in {time.perf_counter()-t0:.1f}s "
          f"(Mosaic kernel calls in MLIR: {has_kernels})", flush=True)
    assert has_kernels, "keep_pallas artifact has no kernel calls — gates off?"

    from jax import export as jax_export

    served = jax_export.deserialize(blob)
    t0 = time.perf_counter()
    got = np.asarray(served.call(ir))
    print(f"artifact call done ({time.perf_counter()-t0:.1f}s incl compile)",
          flush=True)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    print(f"uint8 max|Δ| vs live = {diff.max()} "
          f"(>1 fraction: {(diff > 1).mean():.2e})", flush=True)
    ok = diff.max() <= 8

    # Steady-state throughput of the loaded artifact: chain iterations via a
    # host-fetched scalar so dispatches cannot overlap through the relay.
    carry = 0.0
    for _ in range(3):
        out = served.call(ir + carry * 1e-12)
        carry = float(out[0, 0, 0, 0]) * 1e-9
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = served.call(ir + carry * 1e-12)
        carry = float(out[0, 0, 0, 0]) * 1e-9
    dt = time.perf_counter() - t0
    fps = args.batch * args.iters / dt
    # NOTE: each iteration pays one ~35 ms relay RPC for the scalar fetch —
    # this is a lower bound on the artifact's device rate.
    print(f"artifact steady-state: {fps:.1f} fps at "
          f"{args.height}x{args.width} b{args.batch} "
          f"(incl {args.iters} host-fetch RPCs)", flush=True)
    print("AOTCHECK PASS" if ok else "AOTCHECK FAIL", flush=True)
    _sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

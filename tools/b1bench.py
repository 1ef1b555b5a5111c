"""Batch-1 (single-frame latency) in-context A/B of the fused-kernel
flags (--height/--width, default 512×640) — the measurement behind the round-3 launch-size gate
fix (docs/PERF.md). Run SERIALLY on the TPU."""

import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ircolor_tpu.config import Config
from ircolor_tpu.eval.runner import make_infer_fn
from ircolor_tpu.models.wrapper import generator_from_config
from ircolor_tpu.utils.timing import start_transfer_warmup

start_transfer_warmup()

import argparse

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=1)
p.add_argument("--height", type=int, default=512)
p.add_argument("--width", type=int, default=640)
p.add_argument("--iters", type=int, default=40)
p.add_argument("--force", action="store_true",
               help="force each variant's kernels ON (min_area=0) instead "
                    "of using the shipped launch-size gates")
p.add_argument("--variants", default=None,
               help="comma list of variant names to run (default: all)")
args = p.parse_args()
B = args.batch


def bench(name, cfg, iters=None, warmup=4):
    if args.variants is not None and name not in args.variants.split(","):
        return
    iters = iters or args.iters
    module = generator_from_config(cfg)
    if args.force:
        module = module.clone(
            pallas_block_min_area=0, pallas_norm_blur_min_area=0,
            pallas_head_min_area=0,
        )
    rng = np.random.RandomState(0)
    H, W = args.height, args.width
    ir0 = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) * 2 - 1)
    gt = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    params = module.init(jax.random.PRNGKey(0), ir0[:1])["params"]
    base_infer = make_infer_fn(module)

    @jax.jit
    def chained(params, ir, carry, gt):
        pred, metrics = base_infer(params, ir + carry * 1e-12, gt)
        new_carry = metrics["mae"].astype(ir.dtype).reshape(B, 1, 1, 1)
        return pred, metrics, new_carry

    carry = jnp.zeros((B, 1, 1, 1), ir0.dtype)
    for _ in range(warmup):
        pred, metrics, carry = chained(params, ir0, carry, gt)
    _ = float(jnp.sum(metrics["mae"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        pred, metrics, carry = chained(params, ir0, carry, gt)
    _ = float(jnp.sum(metrics["mae"]))
    dt = (time.perf_counter() - t0) / iters
    print(f"b{B} {name:24s} {dt*1000:7.2f} ms/step  ({B/dt:6.1f} fps)",
          flush=True)

# "shipped" = the true resolved default (int8 at 512×640-class planes since
# round 5); the fused-kernel A/B rows pin quant_int8=False so their meaning
# matches the r3/r4 float measurements they are compared against.
common = dict(img_height=args.height, img_width=args.width, compute_dtype="bf16")
floatc = dict(common, quant_int8=False)
bench("shipped", Config(**common))
bench("xla (all fused off)", Config(**floatc, pallas_block=False, pallas_norm_blur=False, pallas_head=False))
bench("blocks only", Config(**floatc, pallas_norm_blur=False, pallas_head=False))
bench("nb+head only", Config(**floatc, pallas_block=False))
bench("float shipped", Config(**floatc))
bench("int8 shipped", Config(**common, quant_int8=True))
bench("shipped (repeat)", Config(**common))

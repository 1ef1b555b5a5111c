"""In-graph chained timing of GENERATOR backward stage groups.

The train step is now 247.6 ms at b8 512×640 (fused block backward); the
loss-term knockouts (tools/trainbench.py no_perc/no_gan_d/l1_only) split
VGG/D/G at step level, but not WHERE inside G the backward budget sits.
This probe times grad-of-generator compositions with the same chained
fori_loop methodology as tools/fwdvariants.py (data-dependent iterations,
double-duration subtraction):

* g_full      — d(sum(G(x)·ct))/d(x, params): the whole G fwd+bwd.
* g_noblocks  — same with n_blocks=0: encoder/decoder fwd+bwd only.
  (g_full − g_noblocks ≈ the 9-block chain's in-context fwd+bwd cost.)
* blocks_{xla,fused,fused_wg} — an isolated 9-block chain at the
  bottleneck shape (B, H/4, W/4, 256) under each custom_vjp backward.

Run SERIALLY on TPU: python tools/gradbench.py [--batch 8] [--variants ...]
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

from ircolor_tpu.config import Config
from ircolor_tpu.models.wrapper import generator_from_config
from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.norm import instance_norm
from ircolor_tpu.ops.padding import reflect_pad2d
from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas
from ircolor_tpu.utils.timing import start_transfer_warmup, time_chained_fn

DT = jnp.bfloat16


# Shared chained-timing harness (single source of truth for the
# methodology): ircolor_tpu/utils/timing.py.
time_fn = time_chained_fn


def grad_fn_of(module, params, ct):
    """x → dx, with ALL param cotangents kept live (folded into dx at 1e-12
    scale) so the wgrads aren't DCE'd the way a pure grad-wrt-x would be."""

    def loss(x, p):
        y = module.apply({"params": p}, x)
        return jnp.sum((y * ct).astype(jnp.float32))

    gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))

    def fn(x):
        dx, dp = gfn(x, params)
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(dp))
        return dx + (s * 1e-12).astype(dx.dtype)

    return fn


def blocks_chain_fn(ks, ct, bwd, tile_h=32):
    def loss(x, ks):
        h = x
        for k1, k2 in ks:
            if bwd == "xla_chain":
                h1 = jax.nn.relu(instance_norm(
                    conv2d(reflect_pad2d(h, 1), k1, padding="VALID")))
                h = h + instance_norm(
                    conv2d(reflect_pad2d(h1, 1), k2, padding="VALID")
                ).astype(h.dtype)
            else:
                h = resnet_block_pallas(h, k1, k2, tile_h=tile_h, bwd=bwd)
        return jnp.sum((h * ct).astype(jnp.float32))

    gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))

    def fn(x):
        dx, dks = gfn(x, ks)
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(dks))
        return dx + (s * 1e-12).astype(dx.dtype)

    return fn


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--tile-h", type=int, default=32,
                   help="fused-kernel tile for blocks_* variants "
                        "(fwd ships th=32; the bwd kernels were never swept)")
    p.add_argument(
        "--variants",
        default="g_full,g_noblocks,blocks_xla_chain,blocks_fused,blocks_fused_wg",
    )
    args = p.parse_args()
    start_transfer_warmup()
    print(f"devices: {jax.devices()}", flush=True)

    rng = np.random.RandomState(0)
    h, w, b = args.height, args.width, args.batch
    x = jnp.asarray(rng.rand(b, h, w, 1).astype(np.float32) * 2 - 1).astype(DT)
    ct = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)).astype(DT)

    results: dict[str, float] = {}
    for name in args.variants.split(","):
        try:
            if name.startswith("g_"):
                # Attribution suffixes (semantics KNOCKOUTS — the resulting
                # model is NOT the reference; deltas attribute the backward):
                #   _nonorm → all instance norms off (their backward is two
                #             full-plane reductions + elementwise each)
                #   _noaa   → strided convs replace blur-pool down / AA up
                #             (kills the blur + align-corners resize VJPs)
                #   _nolp   → lanepack off (pack/unpack reshape VJPs)
                cfg = Config(
                    img_height=h, img_width=w, batch_size=b,
                    compute_dtype="bf16",
                    # this tool measures the TRAINING graph's G fwd+bwd:
                    # pin the float path (int8 is inference-only; since r5
                    # the bf16 config would otherwise RESOLVE to int8).
                    quant_int8=False,
                    n_blocks=0 if "noblocks" in name else 9,
                    lanepack="_nolp" not in name,
                    norm="none" if "_nonorm" in name else "instance",
                    no_antialias="_noaa" in name,
                    no_antialias_up="_noaa" in name,
                )
                mod = generator_from_config(cfg)
                if "_invjp" in name:  # closed-form IN backward (same primal)
                    mod = mod.clone(in_closed_vjp=True)
                params = mod.init(jax.random.PRNGKey(0), x[:1])["params"]
                fn = grad_fn_of(mod, params, ct)
                x0 = x
            else:
                bwd = name.removeprefix("blocks_")
                tile_h = args.tile_h
                if ":" in bwd:  # blocks_fused_wg:16 → same-process tile sweep
                    bwd, ts = bwd.split(":")
                    tile_h = int(ts)
                hb, wb, cb = h // 4, w // 4, 256
                x0 = jnp.asarray(
                    rng.rand(b, hb, wb, cb).astype(np.float32) * 2 - 1
                ).astype(DT)
                ctb = jnp.asarray(
                    rng.randn(b, hb, wb, cb).astype(np.float32)
                ).astype(DT)
                ks = tuple(
                    (
                        jnp.asarray(rng.randn(3, 3, cb, cb).astype(np.float32) * 0.02).astype(DT),
                        jnp.asarray(rng.randn(3, 3, cb, cb).astype(np.float32) * 0.02).astype(DT),
                    )
                    for _ in range(9)
                )
                fn = blocks_chain_fn(ks, ctb, bwd, tile_h=tile_h)
            dt = time_fn(fn, x0, iters=args.iters)
            results[name] = dt * 1e3
            print(f"{name:18s} {dt * 1e3:8.2f} ms", flush=True)
        except Exception as exc:  # keep later variants running
            print(f"{name:18s} FAILED: {type(exc).__name__}: {str(exc)[:160]}",
                  flush=True)

    if "g_full" in results and "g_noblocks" in results:
        print(
            f"  block-chain in-context share ≈ "
            f"{results['g_full'] - results['g_noblocks']:.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()

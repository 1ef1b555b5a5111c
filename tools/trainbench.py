"""Knockout attribution for the fused train step at the flagship shape.

Times the full 512×640 bf16 train step (D update + G update + composite
loss, `ircolor_tpu/train/step.py`) against variants with individual loss
terms structurally removed (λ=0 skips the term's subgraph entirely — see
make_train_step) and with the D phase disabled. Steps chain through the
donated TrainState (each step consumes the previous params), so iterations
cannot overlap; a terminal ``block_until_ready`` on state.step closes the
measurement. Knockout deltas are non-additive (XLA schedules each variant
differently) but bound where the time goes.

Run SERIALLY on the TPU (CLAUDE.md). Each variant compiles its own
executable (~minutes for 512×640 the first time; persistent-cached after).

Usage: python tools/trainbench.py [--batch 8] [--iters 10] [--variants a,b]
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


VARIANTS: dict[str, tuple[dict, bool]] = {
    # name: (config overrides, update_d)
    # "full" pins the fused-block training path OFF and the blur matmul-VJP
    # OFF so it stays the XLA baseline the PERF.md tables reference (both
    # now default ON; without the pins full == ship and the A/B is a no-op).
    "full": ({"pallas_block_train": False, "blur_matmul_bwd": False}, True),
    "ship": ({}, True),  # shipped defaults (fused blocks via custom_vjp)
    # fused-forward blocks with the XLA custom_vjp backward (pinned: the
    # Config default bwd is now fused_wg, which would make this == ship):
    "pb_train": (
        {"pallas_block_train": True, "pallas_block_bwd": "xla"}, True,
    ),
    # fused blocks + fused Pallas BACKWARD (dgrad launches, wgrads XLA):
    "pb_bwd": (
        {"pallas_block_train": True, "pallas_block_bwd": "fused"}, True,
    ),
    # ... + fused wgrad launches too (the fully fused block backward):
    "pb_bwd_wg": (
        {"pallas_block_train": True, "pallas_block_bwd": "fused_wg"}, True,
    ),
    "nb_train": ({"pallas_norm_blur": True}, True),    # + fused down-stage tails
    "head_train": ({"pallas_head": True}, True),       # + fused 7×7 output head
    "all_fused": (
        {"pallas_norm_blur": True, "pallas_head": True}, True,
    ),  # fused blocks + down tails + head
    # Lane-packing was A/B'd for the INFERENCE forward only; its VJP
    # (pack/unpack reshape transposes at full res) was never costed in
    # training. Identical param tree either way.
    "no_lanepack": ({"lanepack": False}, True),
    # Down-blur backward: matmul-VJP is now the default (== ship); the A/B
    # direction is pinning it OFF (the dilated-depthwise autodiff backward):
    "blur_bwd": ({"blur_matmul_bwd": True}, True),   # kept: == ship
    "blur_bwd_xla": ({"blur_matmul_bwd": False}, True),
    "vgg_lp2": ({}, True),  # lane-packed VGG conv1_1/conv1_2 (p=2)
    # Scatter-free first-max pool VJP (ops/pooling.py) — measured +11.7 ms
    # in context (ship 255.1 → 243.4 with nn.max_pool, same process), so
    # the default is nn.max_pool and this variant opts the fast pool IN:
    "vgg_fast_pool": ({}, True),
    "d_lp2": ({}, True),    # lane-packed PatchGAN conv0/conv_out
    # Closed-form analytic backward for the 5 enc/dec instance norms:
    "in_vjp": ({}, True),
    # Fused Pallas backward for the enc/dec conv+IN+ReLU segments
    # (ops/pallas_encdec.py — down1 dgrad, down2/up1 dgrad+wgrad):
    "encdec_bwd": ({"pallas_encdec_bwd": True}, True),
    "d_concat": ({"d_concat": True}, True),  # one double-batch D fwd/bwd (= ship)
    "d_two": ({"d_concat": False}, True),    # the two-forward D phase
    "no_perc": ({"lambda_perc": 0.0}, True),
    "no_ssim": ({"lambda_ssim": 0.0}, True),
    "no_tv": ({"lambda_tv": 0.0}, True),
    "no_gan_d": ({"lambda_gan": 0.0}, False),
    "l1_only": (
        {"lambda_perc": 0.0, "lambda_ssim": 0.0, "lambda_tv": 0.0, "lambda_gan": 0.0},
        False,
    ),
}


def bench_variant(
    name: str, h: int, w: int, batch: int, iters: int, warmup: int, remat: bool
) -> float:
    from ircolor_tpu.config import Config
    from ircolor_tpu.losses.vgg import VGG16Features, init_vgg16_params
    from ircolor_tpu.train.state import create_train_state
    from ircolor_tpu.train.step import make_train_step

    overrides, update_d = VARIANTS[name]
    cfg = Config(
        img_height=h, img_width=w, batch_size=batch, compute_dtype="bf16",
        remat=remat, **overrides,
    )
    state, g_mod, d_mod, (opt_g, opt_d) = create_train_state(cfg, steps_per_epoch=100)
    if name == "d_lp2":
        d_mod = d_mod.clone(lanepack=True)  # same param layout, packed convs
    if name == "in_vjp":
        g_mod = g_mod.clone(in_closed_vjp=True)  # param-free, same primal
    vgg_mod = VGG16Features(
        dtype=g_mod.dtype, precision=g_mod.precision,
        lanepack_p=2 if name == "vgg_lp2" else 1,
        fast_pool=name == "vgg_fast_pool",
    )
    vgg_params = init_vgg16_params()
    step = make_train_step(cfg, g_mod, d_mod, vgg_mod, opt_g, opt_d, update_d=update_d)
    rng = np.random.RandomState(0)
    data = {
        "ir": jnp.asarray(rng.rand(batch, h, w, 1).astype(np.float32) * 2 - 1),
        "rgb": jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32) * 2 - 1),
    }
    # Completion is forced by a HOST FETCH of a scalar that depends on the
    # final params (float() below) — through the axon relay,
    # block_until_ready alone can return early (CLAUDE.md); the fetched
    # scalar is data-dependent on every chained step, so the wall clock
    # covers the full execution.
    def param_probe(st):
        return float(jax.tree_util.tree_leaves(st.g_params)[0].sum())

    for _ in range(warmup):
        state, metrics = step(state, data, vgg_params)
    param_probe(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, data, vgg_params)
    param_probe(state)
    dt = time.perf_counter() - t0
    return dt / iters


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--variants", default=",".join(VARIANTS))
    args = p.parse_args()

    results: dict[str, float] = {}
    for name in args.variants.split(","):
        # A variant whose kernel fails remote lowering must not abort the
        # remaining, independent variants of a serial measurement run.
        try:
            sec = bench_variant(
                name, args.height, args.width, args.batch, args.iters,
                args.warmup, args.remat,
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name:10s}  FAILED: {type(exc).__name__}: {exc}", flush=True)
            continue
        results[name] = sec
        fps = args.batch / sec
        print(f"{name:10s}  {sec * 1e3:8.1f} ms/step  {fps:6.2f} frames/s", flush=True)

    if "full" in results:
        full = results["full"]
        print("\nknockout deltas vs full:")
        for name, sec in results.items():
            if name != "full":
                print(f"  {name:10s}  -{(full - sec) * 1e3:7.1f} ms  ({(full - sec) / full * 100:5.1f}%)")


if __name__ == "__main__":
    main()

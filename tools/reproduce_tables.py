"""Reproduce the reference's published benchmark tables (README Tables I–III).

The reference's results (`/root/reference/README.md:37-65`, mirrored in
BASELINE.md) are a grid of training regime × test split on KAIST:
Test(Day) = set02, Test(Night) = set05, Test(DN) = both, each evaluated with
the regime's ``netG_best`` checkpoint at img_size 256 and the metric
protocol of `Code/ir_colorization.py:1184-1217`.

This tool runs that whole grid with one command and prints a
Table-I-formatted summary:

  python tools/reproduce_tables.py \
      --dataset-root kaist-dataset/versions/1 \
      --weights D=Weights/trained_w_day/checkpoints_kaist/netG_best.pth \
                N=Weights/trained_w_night/checkpoints_kaist/netG_best.pth \
                DN=Weights/trained_w_day_and_night/checkpoints_kaist/netG_best.pth \
      --out results_tables

Any subset of regimes works (e.g. a single ``D=...``); splits with a missing
set directory are skipped with a warning.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse
import os

from ircolor_tpu.config import Config
from ircolor_tpu.eval.runner import run_test

SPLITS = {
    "Day": ("set02",),
    "Night": ("set05",),
    "DN": ("set02", "set05"),
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset-root", required=True)
    p.add_argument(
        "--weights",
        nargs="+",
        required=True,
        help="regime=checkpoint pairs, e.g. D=.../netG_best.pth",
    )
    p.add_argument("--out", default="results_tables")
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                   help="f32 = reference-parity metrics (default)")
    args = p.parse_args()

    regimes = dict(w.split("=", 1) for w in args.weights)
    rows = []
    for regime, ckpt in regimes.items():
        for split, sets in SPLITS.items():
            roots = tuple(
                os.path.join(args.dataset_root, s)
                for s in sets
                if os.path.isdir(os.path.join(args.dataset_root, s))
            )
            if not roots:
                print(f"[skip] Train({regime})/Test({split}): no set dirs present")
                continue
            cfg = Config(
                mode="test",
                img_size=args.img_size,
                test_batch_size=args.batch,
                compute_dtype=args.dtype,
                test_roots=roots,
                test_G_weights=ckpt,
                output_dir=os.path.join(args.out, f"train_{regime}__test_{split}"),
                save_comparisons=False,
                best50_copy_collages=False,  # no collages exist to copy
                topk=50,
            )
            summary = run_test(cfg)
            if summary.get("count", 0) > 0:
                rows.append(
                    (regime, split, summary["count"], summary["mean_mae"],
                     summary["mean_mse"], summary["mean_psnr"], summary["mean_ssim"])
                )

    print("\n## Table I — training regime × test split (reference README format)\n")
    print("| Training | Test | Count | MAE | MSE | PSNR (dB) | SSIM |")
    print("|---|---|---|---|---|---|---|")
    for regime, split, n, mae, mse, psnr, ssim in rows:
        print(
            f"| Train({regime}) | {split} | {n:,} | {mae:.4f} | {mse:.4f} "
            f"| {psnr:.2f} | {ssim:.2f} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""End-to-end int8 accuracy budget: full test-mode eval (float vs
--quant-int8) on the SAME weights and test tree, through the REAL metric
pipeline (uint8 roundtrip before metrics, ref
`/root/reference/Code/ir_colorization.py:1413`; summary accumulation ref
:1470-1489).

Unlike tools/quantdrift.py (output-vs-output PSNR on device tensors), this
runs ``run_test`` twice and reports the delta of the METRIC SUMMARIES a
user would actually see (ΔPSNR dB, ΔSSIM, ΔMAE/ΔMSE vs GT) plus the
per-pixel uint8 |Δ| histogram between the two modes' saved predictions —
the committed number that turns "int8 is outside the parity budget by
design" into something a user can accept or reject (VERDICT r3 next-step
#5).

Run SERIALLY on TPU:
  python tools/int8budget.py --weights /path/netG_best.pth \
      [--tree /path/synthetic_tree] [--height 512 --width 640]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse
import glob
import json
import os

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None, help=".pth / msgpack netG export")
    ap.add_argument("--tree", default=None, help="KAIST-layout test tree (else synthetic)")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/int8budget")
    ap.add_argument("--cpu", action="store_true")
    # Regression-gate mode (VERDICT r4 #2): exit 1 when |ΔPSNR| / |ΔSSIM|
    # between float and int8 serving exceed the bounds — run per round on a
    # trained checkpoint as the automated check behind the int8-by-default
    # serving mode (tools/r5_converge_run.sh wires it; the r4 measured deltas
    # were −0.011 dB / −0.0002 SSIM against these 0.02 / 0.002 bounds).
    ap.add_argument("--assert-max-dpsnr", type=float, default=None)
    ap.add_argument("--assert-max-dssim", type=float, default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        # foreign-machine XLA:CPU cache entries in the shared dir SIGILL on
        # load (docs/PERF.md r5): use the machine-fingerprinted dir.
        _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tests"))
        from cachedirs import cpu_cache_dir

        _os.environ.setdefault("IRCOLOR_COMPILE_CACHE_DIR", cpu_cache_dir("tools"))
        jax.config.update("jax_compilation_cache_dir", cpu_cache_dir("tools"))

    from ircolor_tpu.config import Config
    from ircolor_tpu.eval.runner import run_test

    tree = args.tree
    if tree is None:
        from ircolor_tpu.data.synthetic import make_kaist_tree

        tree = os.path.join(args.out, "tree")
        if not os.path.isdir(tree):
            make_kaist_tree(
                tree, sets={"set02": {"V000": args.frames}},
                size_hw=(args.height, args.width),
            )

    summaries = {}
    for mode, quant in (("float", False), ("int8", True)):
        cfg = Config(
            mode="test",
            img_height=args.height,
            img_width=args.width,
            compute_dtype="bf16",
            quant_int8=quant,
            test_batch_size=args.batch,
            test_roots=(os.path.join(tree, "set02"),),
            output_dir=os.path.join(args.out, mode),
            test_G_weights=args.weights,
            topk=0,
            save_comparisons=False,
        )
        summaries[mode] = run_test(cfg)

    # Per-pixel uint8 |Δ| histogram between the two modes' saved PNGs.
    import cv2

    fl = sorted(glob.glob(os.path.join(args.out, "float", "set02", "**", "*.png"),
                          recursive=True))
    qt = sorted(glob.glob(os.path.join(args.out, "int8", "set02", "**", "*.png"),
                          recursive=True))
    hist = np.zeros(256, np.int64)
    for fa, fb in zip(fl, qt):
        a = cv2.imread(fa, cv2.IMREAD_COLOR).astype(np.int16)
        b = cv2.imread(fb, cv2.IMREAD_COLOR).astype(np.int16)
        d = np.abs(a - b).ravel()
        hist += np.bincount(d, minlength=256)
    total = int(hist.sum())
    frac_le = np.cumsum(hist) / max(total, 1)

    f, q = summaries["float"], summaries["int8"]
    result = {
        "frames": len(fl),
        "float": {k: f.get(k) for k in ("mean_mae", "mean_mse", "mean_psnr", "mean_ssim")},
        "int8": {k: q.get(k) for k in ("mean_mae", "mean_mse", "mean_psnr", "mean_ssim")},
        "delta_psnr_db": (q.get("mean_psnr") or 0) - (f.get("mean_psnr") or 0),
        "delta_ssim": (q.get("mean_ssim") or 0) - (f.get("mean_ssim") or 0),
        "delta_mae": (q.get("mean_mae") or 0) - (f.get("mean_mae") or 0),
        "pixel_abs_delta": {
            "frac_0": float(hist[0] / max(total, 1)),
            "frac_le_1": float(frac_le[1]),
            "frac_le_2": float(frac_le[2]),
            "frac_le_4": float(frac_le[4]),
            "max": int(np.max(np.nonzero(hist)[0])) if total else 0,
        },
    }
    print(json.dumps(result, indent=2, default=float))

    failures = []
    if args.assert_max_dpsnr is not None and abs(result["delta_psnr_db"]) > args.assert_max_dpsnr:
        failures.append(
            f"|dPSNR| {abs(result['delta_psnr_db']):.4f} dB > {args.assert_max_dpsnr}"
        )
    if args.assert_max_dssim is not None and abs(result["delta_ssim"]) > args.assert_max_dssim:
        failures.append(
            f"|dSSIM| {abs(result['delta_ssim']):.5f} > {args.assert_max_dssim}"
        )
    if failures:
        print("INT8 BUDGET GATE FAILED: " + "; ".join(failures))
        raise SystemExit(1)
    if args.assert_max_dpsnr is not None or args.assert_max_dssim is not None:
        print("INT8 BUDGET GATE PASSED")


if __name__ == "__main__":
    main()

"""Checkpoint parity checker: a reference .pth vs this framework.

Loads a reference-format generator checkpoint twice — into an independent
PyTorch golden implementation (tests/torch_golden.py semantics) and into the
Flax generator via the compat importer — runs both on the same synthetic IR
frames, and reports max |Δ| and the metric deltas (the BASELINE budget is
PSNR within 0.05 dB, SSIM within 0.005). Intended for use with the
reference's published ``netG_*.pth`` weights when available.

Usage:
  python tools/parity_check.py --pth path/to/netG_best.pth [--img-size 256]
  python tools/parity_check.py --random   # self-check with random weights
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tests"))
from cachedirs import cpu_cache_dir  # noqa: E402 — foreign-machine
# XLA:CPU cache entries in the shared dir SIGILL on load (docs/PERF.md r5)
_os.environ.setdefault("IRCOLOR_COMPILE_CACHE_DIR", cpu_cache_dir("tools"))

import argparse
import tempfile

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pth", default=None, help="reference netG .pth checkpoint")
    p.add_argument("--random", action="store_true",
                   help="self-check: random golden weights round-tripped")
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--n-blocks", type=int, default=9)
    p.add_argument("--frames", type=int, default=4)
    args = p.parse_args()

    import torch

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # parity runs in f32 on CPU

    from torch_golden import GoldGenerator

    from ircolor_tpu.compat.torch_import import load_generator_pth
    from ircolor_tpu.eval.metrics import compute_metrics
    from ircolor_tpu.models.generator import ResnetUNetGenerator
    from ircolor_tpu.models.wrapper import merge_params

    gold = GoldGenerator(n_blocks=args.n_blocks)
    if args.pth:
        state = torch.load(args.pth, map_location="cpu", weights_only=True)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        missing, unexpected = gold.load_state_dict(state, strict=False)
        print(f"golden load: {len(missing)} missing, {len(unexpected)} unexpected keys")
        pth = args.pth
    elif args.random:
        pth = _os.path.join(tempfile.mkdtemp(), "netG_random.pth")
        torch.save(gold.state_dict(), pth)
    else:
        p.error("pass --pth or --random")

    module = ResnetUNetGenerator(n_blocks=args.n_blocks)
    s = args.img_size
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, s, s, 1)))["params"]
    params = merge_params(params, load_generator_pth(pth))

    rng = np.random.RandomState(0)
    worst = 0.0
    for i in range(args.frames):
        ir = (rng.rand(1, s, s, 1).astype(np.float32)) * 2 - 1
        ours = np.asarray(module.apply({"params": params}, jnp.asarray(ir)))
        with torch.no_grad():
            theirs = gold(torch.from_numpy(np.transpose(ir, (0, 3, 1, 2)).copy()))
        theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
        diff = float(np.abs(ours - theirs).max())
        worst = max(worst, diff)
        ours01 = np.clip((ours[0] + 1) / 2, 0, 1)
        theirs01 = np.clip((theirs[0] + 1) / 2, 0, 1)
        mae, mse, psnr, ssim = compute_metrics(ours01, theirs01)
        print(f"frame {i}: max|Δ|={diff:.2e}  cross-PSNR={psnr:.2f} dB  cross-SSIM={ssim:.6f}")

    print(f"\nworst max|Δ| = {worst:.3e}")
    ok = worst < 1e-4
    print("PARITY OK" if ok else "PARITY FAILED (>1e-4)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

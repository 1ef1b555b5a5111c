"""Quantization drift: float path vs --quant-int8 on the SAME weights.

Reports output-vs-output PSNR/SSIM (the float path is the reference here,
not the GT) plus max|Δ| — the quality half of the int8 ship decision
(tools/int8probe.py + fwdvariants int8 are the speed half). Works with
random init (structural sanity) or a real checkpoint via --weights; runs
on CPU (--cpu) or TPU. Images: synthetic unless --images points at a KAIST
lwir folder.

Run SERIALLY on TPU: python tools/quantdrift.py [--weights netG.pth]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None, help=".pth / native netG export")
    ap.add_argument("--images", default=None, help="folder of IR images (else synthetic)")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ircolor_tpu.config import Config
    from ircolor_tpu.eval.metrics import quantize_to_uint8_01
    from ircolor_tpu.models.wrapper import IRColorizationModel

    cfg = Config(
        img_height=args.height, img_width=args.width,
        compute_dtype=args.dtype, test_G_weights=args.weights,
    )
    model = IRColorizationModel(cfg)
    if args.weights:
        model.load_weights(args.weights)

    if args.images:
        from ircolor_tpu.data.io import load_ir_image

        files = sorted(
            _os.path.join(args.images, f)
            for f in _os.listdir(args.images)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"))
        )[: args.batch]
        ir = np.stack(
            [load_ir_image(f, (args.height, args.width)) for f in files]
        )[..., None].astype(np.float32) * 2 - 1
    else:
        rng = np.random.RandomState(0)
        # Smooth synthetic IR: random low-frequency fields, closer to
        # thermal imagery than white noise (quant error depends on ranges).
        small = rng.rand(args.batch, args.height // 8, args.width // 8, 1)
        ir = np.asarray(
            jax.image.resize(
                jnp.asarray(small), (args.batch, args.height, args.width, 1), "linear"
            )
        ).astype(np.float32) * 2 - 1
    ir = jnp.asarray(ir)

    quant_module = model.module.clone(quant_int8=True)

    @jax.jit
    def both(params, v):
        yf = model.module.apply({"params": params}, v, train=False)
        yq = quant_module.apply({"params": params}, v, train=False)
        return yf, yq

    yf, yq = jax.device_get(both(model.params, ir))
    # uint8-image space, the convention every shipped artifact/metric uses.
    f8 = np.asarray(quantize_to_uint8_01((jnp.asarray(yf) + 1) / 2)) * 255
    q8 = np.asarray(quantize_to_uint8_01((jnp.asarray(yq) + 1) / 2)) * 255

    mse = float(np.mean((f8 / 255 - q8 / 255) ** 2))
    psnr = float("inf") if mse == 0 else 20 * np.log10(1.0) - 10 * np.log10(mse + 1e-12)
    maxd = float(np.abs(f8 - q8).max())
    print(f"float-vs-int8 drift at {args.height}x{args.width} b{args.batch} "
          f"{args.dtype} weights={args.weights or 'random-init'}:")
    print(f"  PSNR(float, int8) = {psnr:.2f} dB   max|Δ| = {maxd:.0f}/255  "
          f"mean|Δ| = {float(np.abs(f8 - q8).mean()):.3f}/255", flush=True)
    try:
        from skimage.metrics import structural_similarity as ssim

        s = np.mean([
            ssim(f8[i] / 255, q8[i] / 255, channel_axis=2, data_range=1.0)
            for i in range(f8.shape[0])
        ])
        print(f"  SSIM(float, int8) = {s:.5f}", flush=True)
    except ImportError:
        pass


if __name__ == "__main__":
    main()

"""ircolor_tpu — TPU-native LWIR→RGB colorization framework.

A brand-new JAX / Flax / XLA / Pallas / pjit framework with the capabilities of
the reference PyTorch project
`yavuzmurattas/Infrared-Colorization-with-ResNet-Generator-and-PatchGAN`
(`/root/reference/Code/ir_colorization.py`): a Pix2Pix-style conditional GAN
colorizing KAIST LWIR (thermal) frames to RGB.

Package layout (TPU-first, not a port):
  config    — frozen dataclass mirroring the reference ``Config`` fields
  ops       — NHWC building blocks (reflection pad, instance norm, blur-pool
              anti-aliased down/upsample, align-corners bilinear resize)
  models    — ResnetUNetGenerator + NLayerDiscriminator as Flax modules
  losses    — hinge GAN, L1, TV, differentiable SSIM, VGG-16 perceptual
  data      — KAIST scanner/pairing, host input pipeline, synthetic trees
  train     — one jitted fused D+G train step, optax optimizers, orbax ckpts
  eval      — batched jitted inference + device-side MAE/MSE/PSNR/SSIM
  export    — collages, Top-K ranking/copy, metrics CSVs (format-compatible)
  parallel  — jax.sharding Mesh helpers, GSPMD data-parallel shardings
  compat    — PyTorch ``.pth`` checkpoint importer (OIHW→HWIO)
  utils     — structured logging, timing
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache (opt out with IRCOLOR_NO_COMPILE_CACHE=1).
# The 512×640 executables take minutes through this environment's
# remote-compile path; caching makes every re-run start in seconds.
if not _os.environ.get("IRCOLOR_NO_COMPILE_CACHE"):
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "IRCOLOR_COMPILE_CACHE_DIR",
            _os.path.expanduser("~/.cache/jax_comp_cache"),
        ),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ircolor_tpu.config import Config  # noqa: F401

"""Regenerate the committed pinned-weight goldens:

  * tests/goldens/generator_pinned.npz      (generator forward digest)
  * tests/goldens/discriminator_pinned.npz  (PatchGAN forward digest)
  * tests/goldens/vgg_import_pinned.npz     (VGG importer + tower digest)
  * tests/goldens/composite_loss_pinned.npz (full composite-loss values)

Run ONLY after an intentional numeric change; the committed goldens are the
parity anchors across rounds (tests/test_models.py, tests/test_losses.py).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tests"))

import tempfile

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from torch_golden import GoldGenerator
from test_models import GOLDEN_PATH, _pinned_golden_state_dict

from ircolor_tpu.compat.torch_import import load_generator_pth
from ircolor_tpu.models.generator import ResnetUNetGenerator
from ircolor_tpu.models.wrapper import merge_params


def main() -> None:
    gold = GoldGenerator(n_blocks=9)
    sd = _pinned_golden_state_dict(gold)
    pth = _os.path.join(tempfile.mkdtemp(), "pinned_netG.pth")
    torch.save(sd, pth)

    module = ResnetUNetGenerator(n_blocks=9)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]
    params = merge_params(params, load_generator_pth(pth))
    ir = (np.random.RandomState(123).rand(2, 64, 64, 1).astype(np.float32)) * 2 - 1
    out = np.asarray(module.apply({"params": params}, jnp.asarray(ir)))

    _os.makedirs(_os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez_compressed(GOLDEN_PATH, out=out.astype(np.float32))
    print(f"wrote {GOLDEN_PATH}: shape {out.shape}, mean {out.mean():.6f}, "
          f"std {out.std():.6f}")

    # --- discriminator digest ---
    from test_models import DISC_GOLDEN_PATH, pinned_discriminator

    tmp = tempfile.mkdtemp()
    _, d_mod, d_params = pinned_discriminator(tmp)
    xd = np.random.RandomState(321).rand(2, 32, 32, 4).astype(np.float32) * 2 - 1
    d_out = np.asarray(d_mod.apply({"params": d_params}, jnp.asarray(xd)))
    np.savez_compressed(DISC_GOLDEN_PATH, out=d_out.astype(np.float32))
    print(f"wrote {DISC_GOLDEN_PATH}: shape {d_out.shape}, mean {d_out.mean():.6f}")

    # --- VGG importer digest ---
    from test_losses import (
        LOSS_GOLDEN_PATH,
        VGG_GOLDEN_PATH,
        pinned_composite_loss_metrics,
        pinned_vgg_forward,
    )

    v_out = pinned_vgg_forward(tmp)
    np.savez_compressed(VGG_GOLDEN_PATH, out=v_out.astype(np.float32))
    print(f"wrote {VGG_GOLDEN_PATH}: shape {v_out.shape}, mean {v_out.mean():.6f}")

    # --- composite loss digest ---
    metrics = pinned_composite_loss_metrics(tmp)
    np.savez_compressed(
        LOSS_GOLDEN_PATH, **{k: np.float64(v) for k, v in metrics.items()}
    )
    print(f"wrote {LOSS_GOLDEN_PATH}: " +
          ", ".join(f"{k}={v:.6f}" for k, v in sorted(metrics.items())))


if __name__ == "__main__":
    main()

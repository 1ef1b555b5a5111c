"""Regenerate tests/goldens/generator_pinned.npz (the pinned-weights forward
digest asserted by test_models.py::test_generator_pinned_golden_digest).

Run ONLY after an intentional numeric change to the generator; the committed
golden is the parity anchor across rounds.
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


if __name__ == "__main__":
    main()

"""Hinge adversarial losses.

Reference semantics (inline in the train loop,
`/root/reference/Code/ir_colorization.py:1645-1662`):

  L_D = 0.5 · ( E[relu(1 − D(real))] + E[relu(1 + D(fake))] )
  L_G = −E[D(fake)]

Predictions are PatchGAN score maps; means are over all patches and batch.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn


def hinge_d_loss(pred_real: jnp.ndarray, pred_fake: jnp.ndarray) -> jnp.ndarray:
    loss_real = jnp.mean(nn.relu(1.0 - pred_real))
    loss_fake = jnp.mean(nn.relu(1.0 + pred_fake))
    return 0.5 * (loss_real + loss_fake)


def hinge_g_loss(pred_fake: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(pred_fake)

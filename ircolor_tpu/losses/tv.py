"""Anisotropic (L1) total-variation loss.

Reference semantics: ``tv_loss``
(`/root/reference/Code/ir_colorization.py:686-694`) — mean |∂y| + mean |∂x|
of neighboring-pixel differences (absolute, not squared). Input here is NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp


def tv_loss(x: jnp.ndarray) -> jnp.ndarray:
    diff_i = jnp.mean(jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :]))
    diff_j = jnp.mean(jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :]))
    return diff_i + diff_j

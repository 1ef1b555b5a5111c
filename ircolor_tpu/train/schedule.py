"""Linear learning-rate decay schedule.

Reference semantics: ``get_lr_lambda``
(`/root/reference/Code/ir_colorization.py:212-233`) with torch ``LambdaLR``
stepped once per epoch (ref :1607-1609, :1718-1719): training epoch ``k``
(1-based) runs at ``base_lr · f(k)`` where

    f(k) = 1.0                                  for k ≤ decay_start
    f(k) = 0.0                                  for k ≥ epochs
    f(k) = 1 − (k − decay_start)/(epochs − decay_start)   otherwise

(the final epoch trains at LR 0.0 exactly as the reference does). Here the
per-epoch factor becomes a per-step optax schedule via the statically known
steps_per_epoch — one compile, no host-side optimizer-state mutation.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_decay_factor(epoch_1based, decay_start: int, epochs: int):
    """f(k) above; works on ints or traced arrays."""
    e = epoch_1based
    frac = (e - decay_start) / max(1, epochs - decay_start)
    factor = jnp.clip(1.0 - frac, 0.0, 1.0)
    return jnp.where(e >= epochs, 0.0, jnp.where(e <= decay_start, 1.0, factor))


def make_lr_schedule(base_lr: float, steps_per_epoch: int, epochs: int, decay_start: int):
    """optax schedule: step count → LR, matching per-epoch LambdaLR stepping."""

    def schedule(count):
        epoch = count // max(1, steps_per_epoch) + 1  # 1-based training epoch
        return base_lr * linear_decay_factor(epoch, decay_start, epochs)

    return schedule

"""Spatial padding for NHWC tensors.

Reference semantics: ``nn.ReflectionPad2d`` / ``nn.ReplicationPad2d`` /
``nn.ZeroPad2d`` (`/root/reference/Code/ir_colorization.py:291-298, 380-386,
458-459, 527-528`). PyTorch reflection padding excludes the edge pixel
(numpy/jnp ``mode='reflect'``); replication repeats it (``mode='edge'``).
"""

from __future__ import annotations

import jax.numpy as jnp

_PAD_MODES = {
    "reflect": "reflect",
    "replicate": "edge",
    "zero": "constant",
}


def pad2d(
    x: jnp.ndarray,
    pad: int | tuple[int, int, int, int],
    pad_type: str = "reflect",
) -> jnp.ndarray:
    """Pad an NHWC tensor spatially.

    ``pad`` is either a single int (all four sides) or PyTorch-order
    ``(left, right, top, bottom)`` matching ``nn.ReflectionPad2d(padding)``
    with a 4-tuple.
    """
    if isinstance(pad, int):
        l = r = t = b = pad
    else:
        l, r, t, b = pad
    if pad_type not in _PAD_MODES:
        raise NotImplementedError(f"pad type [{pad_type}] not implemented")
    mode = _PAD_MODES[pad_type]
    widths = ((0, 0), (t, b), (l, r), (0, 0))
    if mode == "constant":
        return jnp.pad(x, widths, mode="constant", constant_values=0)
    return jnp.pad(x, widths, mode=mode)


def reflect_pad2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Uniform reflection pad (the generator's 7×7-conv stem/tail pads by 3,
    ResNet blocks by 1; ref :459, :528, :381)."""
    return pad2d(x, pad, "reflect")

"""2×2/2 max pool with a scatter-free backward.

``nn.max_pool``'s autodiff backward lowers to XLA SelectAndScatter, which
runs window-serial on TPU; at the VGG tower's pool1 plane (b8×512×640×64)
it is a measurable chunk of the perceptual loss's backward
(tools/vgggrad.py). Since the windows are a disjoint 2×2 partition, both
directions have closed elementwise forms:

* forward: reshape (B, H/2, 2, W/2, 2, C) and max over the two size-2 axes;
* backward: route ``dy`` to the FIRST maximal element in window row-major
  order — a 4-way comparison cascade — and reassemble by stacking. The
  first-max tie rule matches both XLA's SelectAndScatter (GE select scans
  the window in order) and torch's MaxPool2d backward, so gradients are
  bit-comparable to the reference even on tied inputs (ReLU zero plateaus
  tie constantly). Tested against the autodiff backward and torch
  (tests/test_losses.py).

Reference use: torchvision VGG-16 features[:16] pools inside
``VGGPerceptual`` (`/root/reference/Code/ir_colorization.py:658-664`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Max pool, window 2×2 stride 2, NHWC; requires even H and W."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        # Odd tails: torch's default (floor) drops the last row/col.
        x = x[:, : h - h % 2, : w - w % 2, :]
        b, h, w, c = x.shape
    return _pool_vjp(x)


def _pool_primal(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    v = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(jnp.max(v, axis=4), axis=2)


@jax.custom_vjp
def _pool_vjp(x):
    return _pool_primal(x)


def _pool_fwd(x):
    return _pool_primal(x), x


def _pool_bwd(x, dy):
    b, h, w, c = x.shape
    v = x.reshape(b, h // 2, 2, w // 2, 2, c)
    a = v[:, :, 0, :, 0]
    bb = v[:, :, 0, :, 1]
    cc = v[:, :, 1, :, 0]
    dd = v[:, :, 1, :, 1]
    m = jnp.maximum(jnp.maximum(a, bb), jnp.maximum(cc, dd))
    sa = a >= m
    sb = jnp.logical_and(~sa, bb >= m)
    sc = jnp.logical_and(~jnp.logical_or(sa, sb), cc >= m)
    sd = ~jnp.logical_or(jnp.logical_or(sa, sb), sc)
    z = dy.astype(x.dtype)
    row0 = jnp.stack([z * sa, z * sb], axis=4)      # (B, H/2, W/2, C→, 2)?
    row1 = jnp.stack([z * sc, z * sd], axis=4)
    # stack axes: z·s* are (B, H/2, W/2, C); stack last → (B,H/2,W/2,C,2);
    # arrange to (B, H/2, 2, W/2, 2, C) via transpose.
    dv = jnp.stack([row0, row1], axis=5)            # (B,H/2,W/2,C,2w,2h)
    dv = dv.transpose(0, 1, 5, 2, 4, 3)             # (B,H/2,2,W/2,2,C)
    return (dv.reshape(b, h, w, c),)


_pool_vjp.defvjp(_pool_fwd, _pool_bwd)

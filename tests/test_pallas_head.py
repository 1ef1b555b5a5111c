"""Parity of the fused 7×7 output-head kernel vs the XLA
IN→ReLU→ReflectPad(3)→conv chain (interpret mode on CPU; the TPU ship
decision lives in docs/PERF.md). Reference semantics:
`/root/reference/Code/ir_colorization.py:527-531`."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.norm import instance_norm_stats
from ircolor_tpu.ops.padding import reflect_pad2d
from ircolor_tpu.ops.pallas_head import (
    conv7x7_head_pallas,
    head_supported,
    outc_head,
)


def _xla_chain(x, kernel):
    mean, inv = instance_norm_stats(x)
    z = jnp.maximum(
        (x - mean[:, None, None, :]) * inv[:, None, None, :], 0.0
    ).astype(x.dtype)
    return conv2d(reflect_pad2d(z, 3), kernel, padding="VALID")


# Shapes chosen to exercise: nh==1 (h==th), nh==2 (first/last-only DMA
# branches), nh>2 (mid branch), WG==1 (both W edges on one group), WG>1,
# and a non-64 channel count.
@pytest.mark.parametrize(
    "shape,tile_h",
    [
        ((2, 16, 64, 8), 8),     # nh=2, WG=2
        ((1, 8, 32, 8), 8),      # nh=1, WG=1 (edge windows only)
        ((1, 32, 96, 4), 8),     # nh=4 (mid DMA branch), WG=3
        ((2, 16, 64, 16), 16),   # nh=1 at th=16
        ((1, 16, 80, 8), 8),     # p=40 pack (the 512×640 production pick)
        ((2, 24, 120, 8), 8),    # p=40, WG=3, nh=3
    ],
)
def test_conv7x7_head_pallas_matches_chain(shape, tile_h):
    rng = np.random.RandomState(sum(shape))
    b, h, w, c = shape
    x = jnp.asarray(rng.rand(*shape).astype(np.float32) * 2 - 1)
    kernel = jnp.asarray(rng.rand(7, 7, c, 3).astype(np.float32) * 0.2 - 0.1)
    want = np.asarray(_xla_chain(x, kernel))
    mean, inv = instance_norm_stats(x)
    got = np.asarray(
        conv7x7_head_pallas(x, mean, inv, kernel, tile_h=tile_h, interpret=True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_head_supported_gates():
    from ircolor_tpu.ops.pallas_head import _pick_pack

    assert head_supported((16, 512, 640, 64))
    assert _pick_pack(640, 64, 3) == 40  # WG=16: 8-aligned sublane extent
    assert head_supported((16, 256, 256, 64))
    assert _pick_pack(256, 64, 3) == 32  # WG=8
    # W=640 must NOT pick p=32: WG=20 fails Mosaic's 8-aligned sublane
    # tiling on real TPU ("Slice shape along dimension 2 ... is 20").
    assert not head_supported((1, 16, 60, 64))   # no pack divides W
    assert not head_supported((1, 16, 64, 6))    # p·C % 128 != 0 for all p
    assert not head_supported((1, 4, 640, 64))   # H too small for halos
    assert not head_supported((1, 18, 640, 64))  # no valid H-tile divisor
    assert _pick_pack(64, 64, 3) == 8            # p=32 rejected (WG=2), p=8 fits


def test_outc_head_grad_matches_xla_chain():
    """custom_vjp backward (saved stats + closed-form IN backward + XLA
    dgrad/wgrad) ≡ autodiff of the XLA chain."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 16, 64, 8).astype(np.float32) * 2 - 1)
    kernel = jnp.asarray(rng.rand(7, 7, 8, 3).astype(np.float32) * 0.2 - 0.1)

    def loss_fused(x_, k_):
        return jnp.sum(jnp.tanh(outc_head(x_, k_, interpret=True)) ** 2)

    def loss_xla(x_, k_):
        return jnp.sum(jnp.tanh(_xla_chain(x_, k_)) ** 2)

    gx_f, gk_f = jax.grad(loss_fused, argnums=(0, 1))(x, kernel)
    gx_x, gk_x = jax.grad(loss_xla, argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_x), atol=3e-5)


def _int8_ref_chain(x, kernel):
    """Exact emulation of the int8 head semantics in plain XLA ops: fixed
    127/6σ activation scale after IN+ReLU, per-output-channel int8 weights,
    int32 accumulation, f32 dequant (ops/pallas_head._kernel_head quant)."""
    from jax import lax

    from ircolor_tpu.ops.quant import quantize_weight_per_channel

    mean, inv = instance_norm_stats(x)
    z = jnp.maximum(
        (x.astype(jnp.float32) - mean[:, None, None, :]) * inv[:, None, None, :],
        0.0,
    )
    zq = jnp.minimum(jnp.round(z * (127.0 / 6.0)), 127.0).astype(jnp.int8)
    kq, sw = quantize_weight_per_channel(kernel)
    dn = lax.conv_dimension_numbers(zq.shape, kq.shape, ("NHWC", "HWIO", "NHWC"))
    y32 = lax.conv_general_dilated(
        reflect_pad2d(zq.astype(jnp.float32), 3).astype(jnp.int8),
        kq, (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    return y32.astype(jnp.float32) * (sw * (6.0 / 127.0))


@pytest.mark.parametrize(
    "shape,tile_h",
    [
        ((2, 16, 64, 8), 8),     # nh=2, WG=2
        ((1, 8, 32, 8), 8),      # nh=1, WG=1 (edge windows only)
        ((1, 32, 96, 4), 8),     # nh=4 (mid DMA branch), WG=3
        ((1, 16, 80, 8), 8),     # p=40 pack (the 512×640 production pick)
    ],
)
def test_conv7x7_head_pallas_q_matches_int8_emulation(shape, tile_h):
    """int8 head kernel ≡ the plain-XLA int8 emulation (exact integer math
    inside; only the f32 dequant multiply can reassociate)."""
    rng = np.random.RandomState(sum(shape) + 1)
    b, h, w, c = shape
    x = jnp.asarray(rng.rand(*shape).astype(np.float32) * 2 - 1)
    kernel = jnp.asarray(rng.rand(7, 7, c, 3).astype(np.float32) * 0.2 - 0.1)
    want = np.asarray(_int8_ref_chain(x, kernel))
    mean, inv = instance_norm_stats(x)
    got = np.asarray(
        conv7x7_head_pallas(
            x, mean, inv, kernel, tile_h=tile_h, quant=True, interpret=True
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_outc_head_q_close_to_float():
    """int8 rounding noise only: the quantized head tracks the float head
    at quant-step scale on smooth inputs."""
    from ircolor_tpu.ops.pallas_head import outc_head_q

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 16, 64, 8).astype(np.float32) * 2 - 1)
    kernel = jnp.asarray(rng.rand(7, 7, 8, 3).astype(np.float32) * 0.2 - 0.1)
    f = np.asarray(outc_head(x, kernel, interpret=True))
    q = np.asarray(outc_head_q(x, kernel, interpret=True))
    # One activation quant step ≈ 6/127 ≈ 0.047 per tap; the 7×7×8 window
    # averages the rounding noise well below one step at the output.
    assert np.max(np.abs(f - q)) < 0.15
    assert np.mean(np.abs(f - q)) < 0.02

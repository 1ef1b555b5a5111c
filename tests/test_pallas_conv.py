"""Pallas implicit-GEMM conv tests (interpret mode; compiled+measured on TPU,
see docs/PERF.md)."""

import numpy as np

import jax.numpy as jnp

import pytest

from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.pallas_conv import conv3x3_valid_pallas, conv3x3_valid_pallas_v2


def test_pallas_conv_matches_xla_valid():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 18, 22, 8).astype(np.float32))  # padded
    k = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    got = conv3x3_valid_pallas(x, k, tile_h=8, interpret=True)
    want = conv2d(x, k, padding="VALID")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("mode", ["preshift", "dxcat"])
def test_pallas_conv_v2_matches_xla_valid(mode):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 18, 18, 8).astype(np.float32))  # padded; W=16
    k = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    got = conv3x3_valid_pallas_v2(x, k, tile_h=8, mode=mode, interpret=True)
    want = conv2d(x, k, padding="VALID")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_pallas_conv_unaligned_width():
    """W+2 not a multiple of 8 exercises the sublane-alignment padding."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 13, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
    got = conv3x3_valid_pallas(x, k, tile_h=4, interpret=True)
    want = conv2d(x, k, padding="VALID")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

"""Parity of the Pallas blur-pool kernel vs the reference blur path
(interpret mode on CPU; the TPU benchmark lives in tools/blurprobe.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircolor_tpu.ops.blurpool import blur_downsample
from ircolor_tpu.ops.pallas_blur import blur_downsample_pallas, supported


@pytest.mark.parametrize(
    "shape", [(2, 64, 64, 8), (1, 32, 40, 3), (2, 8, 16, 5), (1, 128, 160, 16)]
)
def test_blur_down_pallas_matches_reference(shape):
    assert supported(shape)
    rng = np.random.RandomState(sum(shape))
    x = jnp.asarray(rng.rand(*shape).astype(np.float32) * 2 - 1)
    ref = np.asarray(blur_downsample(x))
    got = np.asarray(blur_downsample_pallas(x, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_blur_down_pallas_unsupported_shapes():
    assert not supported((1, 2, 8, 3))   # H/2 too small to tile
    assert not supported((1, 7, 8, 3))   # odd H
    assert not supported((1, 8, 7, 3))   # odd W

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


@pytest.mark.parametrize(
    "shape", [(2, 64, 64, 8), (1, 32, 40, 16), (2, 16, 16, 8)]
)
def test_norm_relu_blur_down_pallas_matches_chain(shape):
    """normalize+ReLU on load then blur-pool ≡ the XLA IN→ReLU→pad→blur
    chain (the generator down-stage semantics, ref :469-482)."""
    from ircolor_tpu.ops.norm import instance_norm_stats
    from ircolor_tpu.ops.pallas_blur import norm_relu_blur_down_pallas

    rng = np.random.RandomState(sum(shape))
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    m, inv = instance_norm_stats(x)
    normed = jax.nn.relu(
        (x - m[:, None, None, :]) * inv[:, None, None, :]
    )
    ref = np.asarray(blur_downsample(normed))
    got = np.asarray(norm_relu_blur_down_pallas(x, m, inv, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_norm_relu_blur_down_grad_matches_xla_chain():
    """The custom_vjp backward (blur adjoint → ReLU mask → closed-form IN
    backward) must match autodiff of the XLA IN→ReLU→blur chain."""
    from ircolor_tpu.ops.norm import instance_norm
    from ircolor_tpu.ops.pallas_blur import norm_relu_blur_down

    rng = np.random.RandomState(7)
    B, H, W, C = 2, 32, 32, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(B, H // 2, W // 2, C).astype(np.float32))

    def xla_chain(x):
        return jnp.sum(blur_downsample(jax.nn.relu(instance_norm(x))) * w)

    def fused(x):
        return jnp.sum(norm_relu_blur_down(x, interpret=True) * w)

    want = jax.grad(xla_chain)(x)
    got = jax.grad(fused)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)

"""Pallas fused-kernel parity tests (interpret mode on the CPU backend;
the same kernels compile via Mosaic on TPU). Parity-gated per SURVEY.md
§7.1 step 9: the fused path must match the XLA path exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircolor_tpu.ops.norm import instance_norm
from ircolor_tpu.ops.pallas_kernels import (
    fused_instance_norm,
    fused_instance_norm_residual,
    instance_norm_auto,
    pallas_fits,
)


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_pallas_fits_gate():
    # 256² default-config bottleneck planes (64×64×256) fit comfortably.
    assert pallas_fits((8, 64, 64, 256), jnp.bfloat16)
    assert pallas_fits((8, 64, 64, 256), jnp.float32)
    # 512×640 bottleneck planes (128×160) exceed the scoped-vmem budget once
    # the kernel's f32 stack temporaries are accounted (verified on v5e).
    assert not pallas_fits((8, 128, 160, 256), jnp.bfloat16)
    assert not pallas_fits((1, 512, 640, 256), jnp.float32)
    assert not pallas_fits((1, 64, 64), jnp.float32)  # not 4-D


def test_fused_in_matches_xla():
    x = jnp.asarray(rand(2, 16, 20, 128, seed=1) * 3 + 1)
    got = fused_instance_norm(x, False, True)
    want = instance_norm(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_in_relu_matches_xla():
    x = jnp.asarray(rand(2, 16, 20, 128, seed=2))
    got = fused_instance_norm(x, True, True)
    want = jax.nn.relu(instance_norm(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_in_residual_matches_xla():
    x = jnp.asarray(rand(2, 16, 20, 128, seed=3))
    r = jnp.asarray(rand(2, 16, 20, 128, seed=4))
    got = fused_instance_norm_residual(x, r, True)
    want = instance_norm(x) + r
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_in_multichannel_blocks():
    """C > 128 exercises the channel-block grid dimension."""
    x = jnp.asarray(rand(1, 8, 10, 256, seed=5))
    got = fused_instance_norm(x, False, True)
    want = instance_norm(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_in_gradient_matches_xla():
    x = jnp.asarray(rand(1, 12, 14, 128, seed=6))

    def loss_pallas(x):
        return jnp.sum(fused_instance_norm(x, True, True) ** 2)

    def loss_xla(x):
        return jnp.sum(jax.nn.relu(instance_norm(x)) ** 2)

    g1 = jax.grad(loss_pallas)(x)
    g2 = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_fused_in_residual_gradient():
    x = jnp.asarray(rand(1, 12, 14, 128, seed=7))
    r = jnp.asarray(rand(1, 12, 14, 128, seed=8))

    def loss_pallas(x, r):
        return jnp.sum(fused_instance_norm_residual(x, r, True) ** 2)

    def loss_xla(x, r):
        return jnp.sum((instance_norm(x) + r) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1))(x, r)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(x, r)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_auto_dispatch_fallback():
    """Shapes over budget silently use the XLA path."""
    x = jnp.asarray(rand(1, 256, 320, 256, seed=9))  # too big for VMEM plane
    got = instance_norm_auto(x, relu=True, use_pallas=True, interpret=True)
    want = jax.nn.relu(instance_norm(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

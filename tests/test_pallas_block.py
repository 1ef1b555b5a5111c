"""Fused ResNet-block kernel tests (interpret mode): conv+stats and
normalize-on-load conv reproduce the XLA conv→IN→ReLU→conv→IN(+x) block
exactly."""

import numpy as np

import jax
import jax.numpy as jnp

from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.norm import instance_norm
from ircolor_tpu.ops.padding import reflect_pad2d
from ircolor_tpu.ops.pallas_block import conv3x3_stats, conv3x3_norm_in_stats


def test_fused_block_matches_xla_resblock():
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 16, 20, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)

    raw1_ref = conv2d(reflect_pad2d(x, 1), k1, padding="VALID")
    h1_ref = jax.nn.relu(instance_norm(raw1_ref))
    raw2_ref = conv2d(reflect_pad2d(h1_ref, 1), k2, padding="VALID")
    out_ref = x + instance_norm(raw2_ref)

    raw1, m1, i1 = conv3x3_stats(reflect_pad2d(x, 1), k1, tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(raw1), np.asarray(raw1_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(m1), np.asarray(jnp.mean(raw1_ref, axis=(1, 2))), atol=1e-4
    )
    raw2, m2, i2 = conv3x3_norm_in_stats(
        reflect_pad2d(raw1, 1), k2, m1, i1, tile_h=8, interpret=True
    )
    out = x + (raw2 - m2[:, None, None, :]) * i2[:, None, None, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-3)

"""Client-side Mosaic lowering gates for every candidate Pallas TPU kernel.

``jax.export`` with ``platforms=["tpu"]`` runs the full python-side Mosaic
lowering (jax/_src/pallas/mosaic/lowering.py) on a CPU-only host — the same
pass that rejected ``yh[:, 0::2]`` (strided slice → >2-D gather) and
``xm[:, -1]`` (negative integer index → dynamic_slice) on the real TPU after
the kernels had already passed interpret-mode parity. These tests make that
class of rot a CPU-test failure instead of a wasted serial TPU run. The
remote Mosaic→binary compile (and its silent-HTTP-500 failure mode,
CLAUDE.md) is still only provable on hardware via tools/pallassmoke.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircolor_tpu.ops.norm import instance_norm_stats


def _lower_tpu(fn, *args):
    jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def _bf16(a):
    return jnp.asarray(a.astype(np.float32)).astype(jnp.bfloat16)


def test_resnet_block_pallas_lowers(rng):
    from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas

    x = _bf16(rng.rand(1, 32, 64, 256) * 2 - 1)
    k1 = _bf16(rng.randn(3, 3, 256, 256) * 0.05)
    k2 = _bf16(rng.randn(3, 3, 256, 256) * 0.05)
    _lower_tpu(lambda v: resnet_block_pallas(v, k1, k2, tile_h=16), x)
    # The training path: custom_vjp forward (fused kernels) + XLA backward.
    _lower_tpu(
        jax.grad(
            lambda v: resnet_block_pallas(v, k1, k2, tile_h=16)
            .astype(jnp.float32)
            .sum()
        ),
        x,
    )


@pytest.mark.parametrize("bwd", ["fused", "fused_wg"])
def test_resnet_block_pallas_fused_bwd_lowers(rng, bwd):
    """The fused training paths: custom_vjp forward (fused kernels) +
    fused Pallas backward — 'fused' = conv3x3_dgrad_fused ×2 + XLA wgrads;
    'fused_wg' = + conv3x3_wgrad_fused ×2 (no dy emission)."""
    from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas

    x = _bf16(rng.rand(1, 32, 64, 256) * 2 - 1)
    k1 = _bf16(rng.randn(3, 3, 256, 256) * 0.05)
    k2 = _bf16(rng.randn(3, 3, 256, 256) * 0.05)
    _lower_tpu(
        jax.grad(
            lambda v: resnet_block_pallas(v, k1, k2, tile_h=16, bwd=bwd)
            .astype(jnp.float32)
            .sum()
        ),
        x,
    )


def test_conv3x3_sum_fused_lowers(rng):
    from ircolor_tpu.ops.pallas_resblock import conv3x3_sum_fused

    x = _bf16(rng.rand(1, 32, 64, 128) * 2 - 1)
    k = _bf16(rng.randn(3, 3, 128, 128) * 0.05)
    for pad in ("zero", "reflect"):
        _lower_tpu(
            lambda v, pad=pad: conv3x3_sum_fused([v], [k], pad=pad, tile_h=16)[0],
            x,
        )


def test_conv7x7_head_pallas_lowers(rng):
    from ircolor_tpu.ops.pallas_head import _pick_pack, conv7x7_head_pallas, outc_head

    k7 = _bf16(rng.randn(7, 7, 64, 3) * 0.05)
    # W=320 → p=40 (the 512×640 production pick: WG=8 sublane-aligned);
    # W=256 → p=32 (the 256² pick). Both packs must stay lowerable.
    for w, want_p in ((320, 40), (256, 32)):
        assert _pick_pack(w, 64, 3) == want_p
        x = _bf16(rng.rand(1, 32, w, 64) * 2 - 1)
        mean, inv = instance_norm_stats(x)
        _lower_tpu(
            lambda v, m, i: conv7x7_head_pallas(v, m, i, k7), x, mean, inv
        )
        _lower_tpu(
            jax.grad(lambda v: outc_head(v, k7).astype(jnp.float32).sum()), x
        )


def test_conv7x7_head_pallas_q_lowers(rng):
    from ircolor_tpu.ops.pallas_head import conv7x7_head_pallas, outc_head_q

    k7 = _bf16(rng.randn(7, 7, 64, 3) * 0.05)
    for w in (320, 256):  # p=40 and p=32 packs
        x = _bf16(rng.rand(1, 32, w, 64) * 2 - 1)
        mean, inv = instance_norm_stats(x)
        _lower_tpu(
            lambda v, m, i: conv7x7_head_pallas(v, m, i, k7, quant=True),
            x, mean, inv,
        )
        _lower_tpu(lambda v: outc_head_q(v, k7), x)


def test_norm_relu_blur_down_lowers(rng):
    from ircolor_tpu.ops.pallas_blur import (
        norm_relu_blur_down,
        norm_relu_blur_down_pallas,
    )

    x = _bf16(rng.rand(1, 32, 64, 128) * 2 - 1)
    mean, inv = instance_norm_stats(x)
    _lower_tpu(lambda v, m, i: norm_relu_blur_down_pallas(v, m, i), x, mean, inv)
    _lower_tpu(
        jax.grad(lambda v: norm_relu_blur_down(v).astype(jnp.float32).sum()), x
    )


def test_blur_downsample_pallas_lowers(rng):
    from ircolor_tpu.ops.pallas_blur import blur_downsample_pallas

    x = _bf16(rng.rand(1, 32, 64, 128) * 2 - 1)
    _lower_tpu(blur_downsample_pallas, x)


def test_resnet_block_pallas_q_lowers(rng):
    from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas_q

    x = _bf16(rng.rand(1, 32, 64, 256) * 2 - 1)
    k1 = _bf16(rng.randn(3, 3, 256, 256) * 0.05)
    k2 = _bf16(rng.randn(3, 3, 256, 256) * 0.05)
    _lower_tpu(lambda v: resnet_block_pallas_q(v, k1, k2, tile_h=16), x)


def test_conv3x3_reflect_fused_provided_halo_lowers(rng):
    """The spatial-sharding forms: 'provided' (H+2-row slab input, one
    unconditional halo DMA per tile) and 'separate' (unpadded input + 1-row
    halo operands DMA'd into the tile edges — what the shard_map wrappers
    ship). Float + int8, with and without norm-on-load."""
    from ircolor_tpu.ops.pallas_resblock import (
        conv3x3_reflect_fused,
        conv3x3_reflect_fused_q,
    )

    slab = _bf16(rng.rand(1, 34, 64, 256) * 2 - 1)  # 32 interior + 2 halo
    x = slab[:, 1:-1]
    rows = (slab[:, 0:1], slab[:, -1:])
    k = _bf16(rng.randn(3, 3, 256, 256) * 0.05)
    m = jnp.asarray(rng.randn(1, 256).astype(np.float32))
    iv = jnp.asarray(rng.rand(1, 256).astype(np.float32) + 0.5)
    _lower_tpu(
        lambda v: conv3x3_reflect_fused(v, k, tile_h=16, halo="provided")[0],
        slab,
    )
    _lower_tpu(
        lambda v: conv3x3_reflect_fused(
            v, k, m, iv, tile_h=16, halo="provided"
        )[0],
        slab,
    )
    for th in (16, 32):  # nh=2 (boundary-tile DMAs) and nh=1 (single tile)
        _lower_tpu(
            lambda v, t, bt, th=th: conv3x3_reflect_fused(
                v, k, tile_h=th, halo="separate", halo_rows=(t, bt)
            )[0],
            x, *rows,
        )
    _lower_tpu(
        lambda v, t, bt: conv3x3_reflect_fused(
            v, k, m, iv, tile_h=16, halo="separate", halo_rows=(t, bt)
        )[0],
        x, *rows,
    )
    kq = jnp.asarray(
        np.clip(np.round(rng.randn(3, 3, 256, 256) * 30), -127, 127), jnp.int8
    )
    sc = jnp.asarray(rng.rand(1, 256).astype(np.float32) * 1e-2)
    qs = jnp.asarray(rng.rand(1).astype(np.float32) + 100.0)
    _lower_tpu(
        lambda v: conv3x3_reflect_fused_q(
            v, kq, sc, qscale=qs, tile_h=16, halo="provided"
        )[0],
        slab,
    )
    _lower_tpu(
        lambda v: conv3x3_reflect_fused_q(
            v, kq, sc, mean=m, inv=iv, tile_h=16, halo="provided"
        )[0],
        slab,
    )
    _lower_tpu(
        lambda v, t, bt: conv3x3_reflect_fused_q(
            v, kq, sc, qscale=qs, tile_h=16, halo="separate",
            halo_rows=(t, bt)
        )[0],
        x, *rows,
    )
    _lower_tpu(
        lambda v, t, bt: conv3x3_reflect_fused_q(
            v, kq, sc, mean=m, inv=iv, tile_h=16, halo="separate",
            halo_rows=(t, bt)
        )[0],
        x, *rows,
    )


@pytest.mark.parametrize("wgrad_mode", ["xla", "fused"])
def test_encdec_segment_bwd_lowers(rng, wgrad_mode):
    """The enc/dec conv+IN+ReLU segment backward (ops/pallas_encdec.py):
    zero-pad dgrad (mask_p, no aux) + fused/XLA wgrads, at a down2-like
    shape (128→256) and the up1 concat form (256+128→128)."""
    from ircolor_tpu.ops.pallas_encdec import conv_in_relu_fused

    x = _bf16(rng.rand(1, 32, 64, 128) * 2 - 1)
    k = _bf16(rng.randn(3, 3, 128, 256) * 0.05)
    _lower_tpu(
        jax.grad(
            lambda v, k_: conv_in_relu_fused(wgrad_mode, 16, False, (v,), k_)
            .astype(jnp.float32)
            .sum(),
            argnums=(0, 1),
        ),
        x, k,
    )

    a = _bf16(rng.rand(1, 32, 64, 256) * 2 - 1)
    b = _bf16(rng.rand(1, 32, 64, 128) * 2 - 1)
    kc = _bf16(rng.randn(3, 3, 384, 128) * 0.05)
    _lower_tpu(
        jax.grad(
            lambda aa, bb, k_: conv_in_relu_fused(
                wgrad_mode, 16, False, (aa, bb), k_
            ).astype(jnp.float32).sum(),
            argnums=(0, 1, 2),
        ),
        a, b, kc,
    )


def test_encdec_segment_down1_shape_lowers(rng):
    """down1's asymmetric case: C=64 input (dx written at C=64 — BlockSpec
    write, no halo DMA), dy at C=128 (halo-DMA'd); wgrad stays XLA."""
    from ircolor_tpu.ops.pallas_encdec import conv_in_relu_fused

    x = _bf16(rng.rand(1, 32, 64, 64) * 2 - 1)
    k = _bf16(rng.randn(3, 3, 64, 128) * 0.05)
    _lower_tpu(
        jax.grad(
            lambda v, k_: conv_in_relu_fused("xla", 16, False, (v,), k_)
            .astype(jnp.float32)
            .sum(),
            argnums=(0, 1),
        ),
        x, k,
    )

"""Round-3 fused ResNet-block kernel tests (interpret mode): in-kernel
reflect halos + dx-concat compute + IN fusion reproduce the XLA
reflect-pad/conv/IN/ReLU chain exactly (ref ResnetBlock semantics,
/root/reference/Code/ir_colorization.py:362-418)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.norm import instance_norm
from ircolor_tpu.ops.padding import reflect_pad2d
from ircolor_tpu.ops.pallas_resblock import conv3x3_reflect_fused, resnet_block_pallas


def _stats(raw):
    m = jnp.mean(raw, axis=(1, 2))
    v = jnp.mean(raw * raw, axis=(1, 2)) - m * m
    return m, jax.lax.rsqrt(v + 1e-5)


@pytest.mark.parametrize("tile_h", [4, 8, 16])
def test_fused_conv_reflect_matches_xla(tile_h):
    """H=16 sweeps nh ∈ {4, 2, 1} — interior, two-tile, and single-tile
    halo-DMA branches all exercised."""
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 16, 24, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, C, 12).astype(np.float32) * 0.1)
    want = conv2d(reflect_pad2d(x, 1), k, padding="VALID")
    got, m, inv = conv3x3_reflect_fused(x, k, tile_h=tile_h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    m_ref, inv_ref = _stats(want)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(inv), np.asarray(inv_ref), atol=1e-3, rtol=1e-4)


def test_fused_conv_norm_on_load_matches_xla():
    rng = np.random.RandomState(1)
    B, H, W, C = 1, 8, 16, 8
    raw_prev = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    m, inv = _stats(raw_prev)
    h_ref = jax.nn.relu((raw_prev - m[:, None, None]) * inv[:, None, None])
    want = conv2d(reflect_pad2d(h_ref, 1), k, padding="VALID")
    got, _, _ = conv3x3_reflect_fused(raw_prev, k, m, inv, tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_resnet_block_pallas_matches_xla_block():
    rng = np.random.RandomState(2)
    B, H, W, C = 2, 16, 16, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    h1 = jax.nn.relu(instance_norm(conv2d(reflect_pad2d(x, 1), k1, padding="VALID")))
    want = x + instance_norm(conv2d(reflect_pad2d(h1, 1), k2, padding="VALID"))
    got = resnet_block_pallas(x, k1, k2, tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_resnet_block_pallas_grad_matches_xla_block():
    """The custom_vjp backward (closed-form IN backward + XLA dgrad/wgrad
    convs over saved raws) must match autodiff of the XLA block math for
    dx, dk1, dk2."""
    rng = np.random.RandomState(5)
    B, H, W, C = 2, 16, 16, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))  # fixed cotangent

    def xla_block(x, k1, k2):
        h1 = jax.nn.relu(instance_norm(conv2d(reflect_pad2d(x, 1), k1, padding="VALID")))
        return x + instance_norm(conv2d(reflect_pad2d(h1, 1), k2, padding="VALID"))

    def loss(block):
        return lambda x, k1, k2: jnp.sum(block(x, k1, k2) * w)

    want = jax.grad(loss(xla_block), argnums=(0, 1, 2))(x, k1, k2)
    got = jax.grad(
        loss(lambda *a: resnet_block_pallas(*a, tile_h=8, interpret=True)),
        argnums=(0, 1, 2),
    )(x, k1, k2)
    for g, ref, name in zip(got, want, ("dx", "dk1", "dk2")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(ref), atol=2e-3, rtol=1e-3, err_msg=name
        )


@pytest.mark.parametrize("tile_h", [4, 8, 16])
@pytest.mark.parametrize("bwd", ["fused", "fused_wg"])
def test_resnet_block_fused_bwd_matches_xla_bwd(tile_h, bwd):
    """bwd='fused' (conv3x3_dgrad_fused ×2: IN-backward on load, zero-halo
    dgrad, in-kernel reflect-pad VJP fold, ReLU-mask + stats epilogue,
    fused residual add) and bwd='fused_wg' (+ conv3x3_wgrad_fused ×2:
    z/dy recomputed on load, reflect halos in-DMA, per-tap contractions)
    must match the bwd='xla' custom_vjp backward.
    H=16 sweeps nh ∈ {4, 2, 1} — every fold/halo branch (interior tile,
    edge tiles, single tile with both folds) is exercised."""
    rng = np.random.RandomState(7)
    B, H, W, C = 2, 16, 24, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))

    def loss(bwd):
        def f(x, k1, k2):
            return jnp.sum(
                resnet_block_pallas(
                    x, k1, k2, tile_h=tile_h, bwd=bwd, interpret=True
                ) * w
            )
        return f

    want = jax.grad(loss("xla"), argnums=(0, 1, 2))(x, k1, k2)
    got = jax.grad(loss(bwd), argnums=(0, 1, 2))(x, k1, k2)
    for g, ref, name in zip(got, want, ("dx", "dk1", "dk2")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(ref), atol=2e-4, rtol=1e-4, err_msg=name
        )


def test_conv3x3_dgrad_fused_stages_match_reference():
    """Each fused-dgrad launch against hand-built XLA reference math:
    launch 1 (mask_stats) → dn1/dy2/Σ-stats; launch 2 (residual) →
    dx/dy1. Covers the IN-backward transform, the zero-halo dgrad conv,
    the tile-local reflect-fold (incl. corners), the ReLU mask, the
    stats epilogue, and the fused residual add in isolation."""
    from ircolor_tpu.ops.pallas_resblock import conv3x3_dgrad_fused, _in_bwd

    rng = np.random.RandomState(8)
    B, H, W, C = 2, 12, 16, 8
    g = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    raw1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    raw2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k2 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    m1, i1 = _stats(raw1)
    m2, i2 = _stats(raw2)

    # Reference: IN backward → reflect-pad-conv VJP (fold included by
    # jax.vjp of the pad+conv) → ReLU mask → stats.
    yhat2 = (raw2 - m2[:, None, None]) * i2[:, None, None]
    dy2_ref = _in_bwd(g, yhat2, i2)
    z1 = jax.nn.relu((raw1 - m1[:, None, None]) * i1[:, None, None])
    _, vjp = jax.vjp(
        lambda z: conv2d(reflect_pad2d(z, 1), k2, padding="VALID"), z1
    )
    dz1_ref = vjp(dy2_ref)[0]
    dn1_ref = dz1_ref * (raw1 > m1[:, None, None])
    nh1 = (raw1 - m1[:, None, None]) * i1[:, None, None]
    s_ref = jnp.stack(
        [jnp.sum(dn1_ref, axis=(1, 2)), jnp.sum(dn1_ref * nh1, axis=(1, 2))],
        axis=1,
    )

    gm2 = jnp.mean(g, axis=(1, 2))
    gy2 = (jnp.mean(g * raw2, axis=(1, 2)) - m2 * gm2) * i2
    dn1, dy2, s = conv3x3_dgrad_fused(
        g, raw2, raw1, k2, m2, i2, gm2, gy2, mask_stats=(m1, i1),
        tile_h=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dy2), np.asarray(dy2_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dn1), np.asarray(dn1_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-3)

    # Launch-2 form: residual add, no mask/stats.
    gm1 = s[:, 0] / (H * W)
    gy1 = s[:, 1] / (H * W)
    dy1_ref = _in_bwd(dn1, nh1, i1)
    _, vjp1 = jax.vjp(
        lambda z: conv2d(reflect_pad2d(z, 1), k2, padding="VALID"), raw1
    )
    dx_ref = g + vjp1(dy1_ref)[0]
    dx, dy1 = conv3x3_dgrad_fused(
        dn1, raw1, g, k2, m1, i1, gm1, gy1, tile_h=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dy1), np.asarray(dy1_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-4)


def test_sum_fused_zero_single_matches_xla():
    """n_in=1 zero-SAME: the down-conv form (conv + free IN stats)."""
    from ircolor_tpu.ops.pallas_resblock import conv3x3_sum_fused

    rng = np.random.RandomState(3)
    B, H, W, C, CO = 2, 16, 24, 8, 12
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, C, CO).astype(np.float32) * 0.1)
    want = conv2d(x, k, padding=((1, 1), (1, 1)))
    got, m, inv = conv3x3_sum_fused([x], [k], pad="zero", tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    m_ref, inv_ref = _stats(want)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(inv), np.asarray(inv_ref), atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("pad", ["zero", "reflect"])
@pytest.mark.parametrize("tile_h", [8, 16])
def test_sum_fused_two_inputs_matches_concat_conv(pad, tile_h):
    """n_in=2: ≡ one conv over the channel concat (the decoder skip conv)."""
    from ircolor_tpu.ops.pallas_resblock import conv3x3_sum_fused

    rng = np.random.RandomState(4)
    B, H, W = 1, 16, 16
    ca, cb, co = 16, 8, 24
    a = jnp.asarray(rng.randn(B, H, W, ca).astype(np.float32))
    bb = jnp.asarray(rng.randn(B, H, W, cb).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, ca + cb, co).astype(np.float32) * 0.1)
    cat = jnp.concatenate([a, bb], axis=-1)
    if pad == "zero":
        want = conv2d(cat, k, padding=((1, 1), (1, 1)))
    else:
        want = conv2d(reflect_pad2d(cat, 1), k, padding="VALID")
    got, m, inv = conv3x3_sum_fused(
        [a, bb], [k[:, :, :ca], k[:, :, ca:]], pad=pad, tile_h=tile_h,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    m_ref, _ = _stats(want)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-4)


# --- int8 fused variant (serving mode) ---


def _fake_quant_block_reference(x, k1, k2):
    """Exact XLA twin of resnet_block_pallas_q's math: int-valued convs with
    int32 accumulation, identical scale placement and stats order."""
    from ircolor_tpu.ops.quant import _AMAX_FLOOR, quantize_weight_per_channel
    from ircolor_tpu.ops.pallas_resblock import _QCLIP

    kq1, sw1 = quantize_weight_per_channel(k1)
    kq2, sw2 = quantize_weight_per_channel(k2)
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3)), _AMAX_FLOOR)

    def int_conv(xq_i8, kq):
        pad = reflect_pad2d(xq_i8.astype(jnp.int8), 1)
        y32 = jax.lax.conv_general_dilated(
            pad, kq, (1, 1), "VALID",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                pad.shape, kq.shape, ("NHWC", "HWIO", "NHWC")
            ),
            preferred_element_type=jnp.int32,
        )
        return y32

    xq1 = jnp.clip(jnp.round(xf * (127.0 / amax)[:, None, None, None]), -127, 127)
    sc1 = (amax / 127.0)[:, None] * sw1[None, :]
    y1 = int_conv(xq1, kq1).astype(jnp.float32) * sc1[:, None, None, :]
    m1, i1 = _stats(y1)
    z = jnp.maximum((y1 - m1[:, None, None, :]) * i1[:, None, None, :], 0.0)
    xq2 = jnp.minimum(jnp.round(z * (127.0 / _QCLIP)), 127.0)
    y2 = int_conv(xq2, kq2).astype(jnp.float32) * (
        (_QCLIP / 127.0) * sw2[None, :]
    )[:, None, None, :]
    m2, i2 = _stats(y2)
    out = xf + (y2 - m2[:, None, None, :]) * i2[:, None, None, :]
    return out.astype(x.dtype)


@pytest.mark.parametrize("tile_h", [4, 16])
def test_resnet_block_pallas_q_matches_fake_quant_reference(tile_h):
    from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas_q

    rng = np.random.RandomState(3)
    B, H, W, C = 2, 16, 24, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    want = np.asarray(_fake_quant_block_reference(x, k1, k2))
    got = np.asarray(
        resnet_block_pallas_q(x, k1, k2, tile_h=tile_h, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_resnet_block_pallas_q_tracks_float_block():
    """Quantized block ≈ float block within int8 rounding noise (the scales
    are absorbed by the INs — any systematic scale error would blow this)."""
    from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas_q

    rng = np.random.RandomState(4)
    B, H, W, C = 2, 16, 24, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    fl = np.asarray(resnet_block_pallas(x, k1, k2, tile_h=4, interpret=True))
    q = np.asarray(resnet_block_pallas_q(x, k1, k2, tile_h=4, interpret=True))
    # The residual dominates; the quantized branch should stay close.
    assert np.max(np.abs(q - fl)) < 0.25
    assert np.mean(np.abs(q - fl)) < 0.03


# --- spatial-sharding (H-axis shard_map) composition ---


def _spatial_block_fn(blk, mesh, *, tile_h):
    """shard_map wrapper mirroring ResnetBlock's spatial dispatch."""
    import functools

    from jax.sharding import PartitionSpec as P

    return jax.jit(jax.shard_map(
        functools.partial(blk, axis="sp", tile_h=tile_h, interpret=True),
        mesh=mesh,
        in_specs=(P(None, "sp", None, None), P(), P()),
        out_specs=P(None, "sp", None, None),
        check_vma=False,
    ))


@pytest.mark.parametrize("tile_h", [4, 8, 16])
def test_fused_conv_separate_halo_matches_reflect(tile_h):
    """halo='separate' (1-row halo operands DMA'd into the tile edges —
    what the shard_map wrappers ship) ≡ the in-kernel reflect path, across
    nh ∈ {4, 2, 1}."""
    rng = np.random.RandomState(9)
    B, H, W, C = 2, 16, 16, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, C, 12).astype(np.float32) * 0.1)
    want, m_ref, i_ref = conv3x3_reflect_fused(x, k, tile_h=tile_h, interpret=True)
    got, m, inv = conv3x3_reflect_fused(
        x, k, tile_h=tile_h, halo="separate",
        halo_rows=(x[:, 1:2], x[:, -2:-1]), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(inv), np.asarray(i_ref))


def test_fused_conv_provided_halo_matches_reflect():
    """halo='provided' on a hand-built reflect slab ≡ the in-kernel reflect
    path (output AND stats) — the contract the shard_map wrapper relies on."""
    rng = np.random.RandomState(6)
    B, H, W, C = 2, 16, 16, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, C, 12).astype(np.float32) * 0.1)
    want, m_ref, i_ref = conv3x3_reflect_fused(x, k, tile_h=8, interpret=True)
    slab = reflect_pad2d(x, 1)[:, :, 1:-1]  # H halo rows only; W untouched
    got, m, inv = conv3x3_reflect_fused(
        slab, k, tile_h=8, halo="provided", interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(inv), np.asarray(i_ref))


@pytest.mark.parametrize("n_sp", [2, 4, 8])
def test_resnet_block_pallas_spatial_matches_single_device(
    eight_cpu_devices, n_sp
):
    """The shard_map spatial block (ppermuted halo rows + psum'd IN stats)
    ≡ the single-device fused block, for 2/4/8-way H sharding."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas_spatial

    rng = np.random.RandomState(7)
    B, H, W, C = 2, 32, 16, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    want = resnet_block_pallas(x, k1, k2, tile_h=8, interpret=True)
    mesh = Mesh(np.asarray(eight_cpu_devices[:n_sp]), ("sp",))
    fn = _spatial_block_fn(resnet_block_pallas_spatial, mesh, tile_h=4)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "sp", None, None)))
    got = fn(xs, k1, k2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_resnet_block_pallas_q_spatial_matches_single_device(eight_cpu_devices):
    """int8 spatial block: global (pmax'd) amax ⇒ identical quant grid ⇒
    matches the single-device int8 block to f32 reduction-order noise."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ircolor_tpu.ops.pallas_resblock import (
        resnet_block_pallas_q,
        resnet_block_pallas_q_spatial,
    )

    rng = np.random.RandomState(8)
    B, H, W, C = 2, 32, 16, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    want = resnet_block_pallas_q(x, k1, k2, tile_h=8, interpret=True)
    mesh = Mesh(np.asarray(eight_cpu_devices), ("sp",))
    fn = _spatial_block_fn(resnet_block_pallas_q_spatial, mesh, tile_h=4)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "sp", None, None)))
    got = fn(xs, k1, k2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

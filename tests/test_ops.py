"""Unit tests for NHWC building blocks vs PyTorch golden semantics.

Covers the SURVEY.md §4 unit-test plan: binomial filter table, pad modes,
instance norm, Downsample/UpsampleAA shape+value behavior including
align_corners=True bilinear, and the align-corners resize itself.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ircolor_tpu.ops import (
    bilinear_align_corners,
    blur_downsample,
    blur_upsample_aa,
    binomial_filter_2d,
    instance_norm,
    pad2d,
    upsample2x_align_corners,
)

from torch_golden import GoldDownsample, GoldUpsampleAA


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_binomial_filter_values():
    f3 = binomial_filter_2d(3)
    expected = np.outer([1, 2, 1], [1, 2, 1]) / 16.0
    np.testing.assert_allclose(f3, expected, rtol=1e-7)
    for size in range(1, 8):
        f = binomial_filter_2d(size)
        assert f.shape == (size, size)
        np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-6)
    with pytest.raises(ValueError):
        binomial_filter_2d(8)


@pytest.mark.parametrize("pad_type,torch_mode", [
    ("reflect", "reflect"), ("replicate", "replicate"), ("zero", "constant"),
])
def test_pad2d_matches_torch(pad_type, torch_mode):
    x = rand(2, 6, 7, 3)
    ours = np.asarray(pad2d(jnp.asarray(x), (1, 2, 3, 1), pad_type))
    theirs = nhwc(F.pad(nchw(x), (1, 2, 3, 1), mode=torch_mode))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_instance_norm_matches_torch():
    x = rand(3, 8, 9, 5, seed=1) * 4 + 2
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    theirs = nhwc(torch.nn.InstanceNorm2d(5)(nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_instance_norm_onepass_matches_torch():
    from ircolor_tpu.ops.norm import instance_norm_onepass

    # Large mean relative to variance stresses the E[x²]−μ² cancellation.
    x = rand(3, 8, 9, 5, seed=2) * 4 + 10
    ours = np.asarray(instance_norm_onepass(jnp.asarray(x)))
    theirs = nhwc(torch.nn.InstanceNorm2d(5)(nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_instance_norm_cvjp_matches_autodiff():
    """Closed-form IN backward (ops/norm.py:instance_norm_cvjp): primal
    identical to the one-pass form; grad matches autodiff through the
    stats chain to f32 rounding, including composed with a ReLU + reduce
    downstream (the generator's norm_relu shape of use)."""
    from ircolor_tpu.ops.norm import instance_norm_cvjp, instance_norm_onepass

    x = jnp.asarray(rand(2, 8, 10, 5, seed=3) * 3 + 5)
    ct = jnp.asarray(rand(2, 8, 10, 5, seed=4))
    np.testing.assert_array_equal(
        np.asarray(instance_norm_cvjp(x)), np.asarray(instance_norm_onepass(x))
    )
    loss = lambda f, x: jnp.sum(jax.nn.relu(f(x)) * ct)
    g_ref = jax.grad(lambda x: loss(instance_norm_onepass, x))(x)
    g_cf = jax.grad(lambda x: loss(instance_norm_cvjp, x))(x)
    np.testing.assert_allclose(np.asarray(g_cf), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)
    # bf16 path: both round through the same f32 compute.
    xb = x.astype(jnp.bfloat16)
    gb_ref = jax.grad(
        lambda x: loss(instance_norm_onepass, x).astype(jnp.float32)
    )(xb)
    gb_cf = jax.grad(
        lambda x: loss(instance_norm_cvjp, x).astype(jnp.float32)
    )(xb)
    np.testing.assert_allclose(
        np.asarray(gb_cf, np.float32), np.asarray(gb_ref, np.float32),
        atol=1e-2, rtol=1e-2,
    )


@pytest.mark.parametrize("filt_size", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
def test_blur_downsample_matches_torch(filt_size, pad_type):
    x = rand(2, 12, 16, 4, seed=2)
    ours = np.asarray(blur_downsample(jnp.asarray(x), filt_size=filt_size, pad_type=pad_type))
    gold = GoldDownsample(4, filt_size=filt_size, pad_type=pad_type)
    theirs = nhwc(gold(nchw(x)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("filt_size", [3, 4])
def test_blur_upsample_aa_matches_torch(filt_size):
    x = rand(2, 8, 10, 3, seed=3)
    ours = np.asarray(blur_upsample_aa(jnp.asarray(x), filt_size=filt_size))
    gold = GoldUpsampleAA(3, filt_size=filt_size)
    theirs = nhwc(gold(nchw(x)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("filt_size", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
def test_blur_downsample_matmul_bwd_matches_autodiff(filt_size, pad_type):
    """The matmul_bwd custom_vjp (transposed banded matmuls) equals the
    depthwise autodiff backward to f32 rounding — the blur is linear, so
    its VJP is exactly the transposed operator."""
    x = jnp.asarray(rand(2, 12, 16, 4, seed=6))
    ct = None

    def loss(x, bwd):
        y = blur_downsample(
            x, filt_size=filt_size, pad_type=pad_type, matmul_bwd=bwd
        )
        nonlocal ct
        if ct is None:
            ct = jnp.asarray(rand(*y.shape, seed=7))
        return jnp.sum(y * ct)

    g_ref = jax.grad(lambda x: loss(x, False))(x)
    g_mm = jax.grad(lambda x: loss(x, True))(x)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref), atol=2e-6)
    # Forward is byte-identical (same primal code path).
    np.testing.assert_array_equal(
        np.asarray(blur_downsample(x, filt_size=filt_size, pad_type=pad_type)),
        np.asarray(
            blur_downsample(
                x, filt_size=filt_size, pad_type=pad_type, matmul_bwd=True
            )
        ),
    )


def test_generator_grads_match_with_blur_matmul_bwd():
    """Generator-level: blur_matmul_bwd=True changes no gradient beyond f32
    rounding (n_blocks=0 keeps the test fast; both down-blurs engage)."""
    from ircolor_tpu.config import Config
    from ircolor_tpu.models.wrapper import generator_from_config

    x = jnp.asarray(rand(1, 16, 20, 1, seed=8) * 2 - 1)
    grads = {}
    for flag in (False, True):
        cfg = Config(
            img_height=16, img_width=20, batch_size=1, compute_dtype="f32",
            n_blocks=0, blur_matmul_bwd=flag,
        )
        mod = generator_from_config(cfg)
        params = mod.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p):
            return jnp.sum(mod.apply({"params": p}, x) ** 2)

        grads[flag] = jax.grad(loss)(params)
    flat_f = jax.tree_util.tree_leaves(grads[False])
    flat_t = jax.tree_util.tree_leaves(grads[True])
    for a, b in zip(flat_f, flat_t):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


@pytest.mark.parametrize("out_hw", [(16, 20), (15, 9), (7, 7), (31, 33)])
def test_bilinear_align_corners_matches_torch(out_hw):
    x = rand(2, 8, 10, 3, seed=4)
    ours = np.asarray(bilinear_align_corners(jnp.asarray(x), out_hw))
    theirs = nhwc(F.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=True))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_upsample2x_align_corners_matches_torch():
    x = rand(1, 5, 6, 2, seed=5)
    ours = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    theirs = nhwc(F.interpolate(nchw(x), scale_factor=2, mode="bilinear", align_corners=True))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_downsample_halves_even_inputs():
    x = jnp.ones((1, 64, 80, 2))
    y = blur_downsample(x)
    assert y.shape == (1, 32, 40, 2)
    # Blur of a constant image is the same constant (filter sums to 1).
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-6)


@pytest.mark.parametrize("hw", [(8, 10), (3, 3), (5, 16)])
def test_conv3x3_reflect_matches_pad_then_conv(hw):
    """Border-corrected zero-SAME conv == reflect_pad(1) + VALID conv."""
    from ircolor_tpu.ops.conv import conv2d, conv3x3_reflect

    h, w = hw
    x = jnp.asarray(rand(2, h, w, 5, seed=11))
    k = jnp.asarray(rand(3, 3, 5, 7, seed=12) * 0.2)
    b = jnp.asarray(rand(7, seed=13) * 0.1)
    ours = np.asarray(conv3x3_reflect(x, k, b))
    ref = np.asarray(conv2d(pad2d(x, 1, "reflect"), k, padding="VALID")) + np.asarray(b)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_conv3x3_reflect_gradients_match():
    from ircolor_tpu.ops.conv import conv2d, conv3x3_reflect
    import jax

    x = jnp.asarray(rand(1, 6, 7, 4, seed=14))
    k = jnp.asarray(rand(3, 3, 4, 4, seed=15) * 0.2)

    g1 = jax.grad(lambda x, k: jnp.sum(conv3x3_reflect(x, k) ** 2), argnums=(0, 1))(x, k)
    g2 = jax.grad(
        lambda x, k: jnp.sum(conv2d(pad2d(x, 1, "reflect"), k, padding="VALID") ** 2),
        argnums=(0, 1),
    )(x, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestLanePack:
    """conv2d_lanepack must be exact vs the plain conv for any p."""

    def _check(self, kh_kw, cin, cout, p, h=12, w=32, padding="SAME"):
        import numpy as np
        import jax.numpy as jnp
        from ircolor_tpu.ops.conv import conv2d, conv2d_lanepack

        rng = np.random.RandomState(p * 100 + cout)
        kh, kw = kh_kw
        if padding == "VALID":  # caller pre-padded (e.g. reflect), both dims
            x = jnp.asarray(rng.randn(2, h + kh - 1, w + kw - 1, cin).astype(np.float32))
            ref = conv2d(x, k := jnp.asarray(rng.randn(kh, kw, cin, cout).astype(np.float32)), padding="VALID")
        else:
            x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
            ref = conv2d(x, k := jnp.asarray(rng.randn(kh, kw, cin, cout).astype(np.float32)),
                         padding=((kh // 2, kh // 2), (kw // 2, kw // 2)))
        bias = jnp.asarray(rng.randn(cout).astype(np.float32))
        ref = ref + bias
        got = conv2d_lanepack(x, k, p, padding=padding, bias=bias)
        assert got.shape == ref.shape
        # exact up to f32 reassociation of the widened contraction
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)

    def test_3x3_cout64_p2(self):
        self._check((3, 3), 8, 64, 2)

    def test_7x7_cout3_p8(self):
        self._check((7, 7), 5, 3, 8)

    def test_7x7_cout3_p32(self):
        self._check((7, 7), 5, 3, 32)

    def test_valid_prepadded(self):
        self._check((7, 7), 5, 3, 8, padding="VALID")

    def test_p1_degenerates_to_plain(self):
        self._check((3, 3), 4, 6, 1)

    def _check_strided(self, kh_kw, cin, cout, p, stride, pad, h=16, w=32):
        """Strided/even-kernel packing (the PatchGAN 4x4 s2 shape, ref :599-630)."""
        import numpy as np
        import jax.numpy as jnp
        from ircolor_tpu.ops.conv import conv2d, conv2d_lanepack

        rng = np.random.RandomState(p * 10 + cout)
        kh, kw = kh_kw
        x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
        k = jnp.asarray(rng.randn(kh, kw, cin, cout).astype(np.float32))
        bias = jnp.asarray(rng.randn(cout).astype(np.float32))
        ref = conv2d(x, k, stride=stride, padding=pad) + bias
        got = conv2d_lanepack(x, k, p, stride=stride, padding=pad, bias=bias)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)

    def test_4x4_s2_cout64_p2(self):
        self._check_strided((4, 4), 4, 64, 2, 2, ((1, 1), (1, 1)))

    def test_4x4_s1_cout1_p8(self):
        self._check_strided((4, 4), 8, 1, 8, 1, ((1, 2), (1, 2)))

    def test_3x3_s2_explicit_pad_p4(self):
        self._check_strided((3, 3), 4, 8, 4, 2, ((1, 1), (1, 1)))



@pytest.mark.parametrize(
    "k,p,h,w,ci,co",
    [(7, 1, 16, 20, 8, 3), (7, 4, 16, 32, 8, 3), (3, 1, 8, 10, 4, 6),
     (5, 2, 12, 16, 4, 2), (7, 32, 32, 64, 16, 3)],
)
def test_conv_reflect_same_matches_pad_then_conv(k, p, h, w, ci, co):
    """Exact reflect-pad conv without the materialized pad: zero-SAME bulk
    (lane-packed when p>1) + border-strip overwrite must match
    reflect_pad2d + VALID conv bit-for-bit on the interior and to float
    tolerance on the recomputed border (reassociation only)."""
    from ircolor_tpu.ops.conv import conv2d, conv_reflect_same
    from ircolor_tpu.ops.padding import reflect_pad2d

    rng = np.random.RandomState(k * 100 + p)
    x = jnp.asarray(rng.randn(2, h, w, ci).astype(np.float32))
    kk = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    want = conv2d(reflect_pad2d(x, k // 2), kk, padding="VALID") + bias
    got = conv_reflect_same(x, kk, p=p, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

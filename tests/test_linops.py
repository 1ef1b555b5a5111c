"""Per-axis linear-operator (MXU matmul) path tests: exact equivalence with
the elementwise/gather implementations and with torch golden modules at
wide channel counts (the dispatch threshold is 32 channels).
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ircolor_tpu.ops.blurpool import blur_downsample, blur_upsample_aa
from ircolor_tpu.ops.linops import (
    apply_axis_ops,
    blur_matrix,
    resize_matrix,
    upsample_blur_matrix,
)
from ircolor_tpu.ops.resize import bilinear_align_corners

from torch_golden import GoldDownsample, GoldUpsampleAA


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def rand(*s, seed=0):
    return np.random.RandomState(seed).randn(*s).astype(np.float32)


def test_resize_matrix_rows_sum_to_one():
    for insz, outsz in [(8, 16), (16, 9), (5, 5), (1, 4)]:
        m = resize_matrix(insz, outsz)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_blur_matrix_rows_sum_to_one_reflect():
    for size, stride in [(16, 2), (16, 1), (10, 2)]:
        m = blur_matrix(size, 3, stride, "reflect")
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_matmul_blur_downsample_matches_torch_wide():
    """Both down-blur forms (shipped depthwise default and the opt-in
    matmul path) must equal the torch golden at wide channel counts."""
    x = rand(2, 16, 20, 64, seed=1)
    gold = GoldDownsample(64)
    theirs = nhwc(gold(nchw(x)))
    default = np.asarray(blur_downsample(jnp.asarray(x)))
    np.testing.assert_allclose(default, theirs, atol=2e-5)
    matmul = np.asarray(blur_downsample(jnp.asarray(x), use_matmul=True))
    np.testing.assert_allclose(matmul, theirs, atol=2e-5)


def test_matmul_blur_upsample_matches_torch_wide():
    x = rand(2, 8, 10, 64, seed=2)
    ours = np.asarray(blur_upsample_aa(jnp.asarray(x)))
    gold = GoldUpsampleAA(64)
    theirs = nhwc(gold(nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_matmul_resize_matches_torch_wide():
    x = rand(2, 8, 10, 64, seed=3)
    ours = np.asarray(bilinear_align_corners(jnp.asarray(x), (15, 9)))
    theirs = nhwc(F.interpolate(nchw(x), size=(15, 9), mode="bilinear", align_corners=True))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_matmul_path_equals_gather_path():
    """Same op, both dispatch branches (C=64 matmul vs C=4 gather)."""
    x_wide = rand(1, 12, 14, 64, seed=4)
    wide = np.asarray(blur_upsample_aa(jnp.asarray(x_wide)))
    for c in range(0, 64, 16):
        x_narrow = x_wide[..., c : c + 4]
        narrow = np.asarray(blur_upsample_aa(jnp.asarray(x_narrow)))
        np.testing.assert_allclose(wide[..., c : c + 4], narrow, atol=2e-5)


def test_upsample_blur_matrix_composition():
    """(blur @ resize) equals applying them separately."""
    comp = upsample_blur_matrix(10)
    sep = blur_matrix(20, 3, 1, "reflect") @ resize_matrix(10, 20)
    np.testing.assert_allclose(comp, sep, atol=1e-6)


def test_blur_matrix_pad_types_match_legacy():
    from ircolor_tpu.ops.padding import pad2d
    from ircolor_tpu.ops.separable import separable_filter2d
    from ircolor_tpu.ops.filters import binomial_filter_1d

    a = binomial_filter_1d(3)
    a = a / a.sum()
    x = rand(1, 9, 11, 2, seed=5)  # narrow → legacy path used by blurpool
    for pad_type in ("reflect", "replicate", "zero"):
        legacy = separable_filter2d(
            jnp.asarray(pad2d(jnp.asarray(x), (1, 1, 1, 1), pad_type)),
            a, padding="valid", stride=2,
        )
        m_h = blur_matrix(9, 3, 2, pad_type)
        m_w = blur_matrix(11, 3, 2, pad_type)
        matmul = apply_axis_ops(jnp.asarray(x), m_h, m_w)
        np.testing.assert_allclose(np.asarray(matmul), np.asarray(legacy), atol=1e-5)

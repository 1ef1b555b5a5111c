"""Metric tests: PSNR formula, skimage-default SSIM (vs independent numpy
translation), uint8 quantization parity, schedule table.
"""

import math

import numpy as np

import jax.numpy as jnp

from ircolor_tpu.eval.metrics import (
    batched_metrics,
    compute_metrics,
    quantize_to_uint8_01,
    ssim_skimage,
)
from ircolor_tpu.train.schedule import linear_decay_factor, make_lr_schedule

from torch_golden import skimage_ssim_numpy


def test_psnr_formula():
    rng = np.random.RandomState(0)
    a = rng.rand(1, 16, 16, 3).astype(np.float32)
    b = rng.rand(1, 16, 16, 3).astype(np.float32)
    m = {k: np.asarray(v) for k, v in batched_metrics(jnp.asarray(a), jnp.asarray(b)).items()}
    mse = float(np.mean((a - b) ** 2))
    expect = 20.0 * math.log10(1.0) - 10.0 * math.log10(mse + 1e-12)
    np.testing.assert_allclose(m["psnr"][0], expect, rtol=1e-4)
    np.testing.assert_allclose(m["mae"][0], np.abs(a - b).mean(), rtol=1e-5)
    np.testing.assert_allclose(m["mse"][0], mse, rtol=1e-5)


def test_psnr_inf_on_identical():
    a = jnp.asarray(np.random.RandomState(1).rand(1, 8, 8, 3).astype(np.float32))
    m = batched_metrics(a, a)
    assert np.isinf(np.asarray(m["psnr"])[0])
    np.testing.assert_allclose(np.asarray(m["ssim"])[0], 1.0, atol=1e-5)


def test_ssim_matches_skimage_translation():
    rng = np.random.RandomState(2)
    gt = rng.rand(24, 28, 3).astype(np.float32)
    pred = np.clip(gt + 0.15 * rng.randn(24, 28, 3).astype(np.float32), 0, 1)
    ours = float(ssim_skimage(jnp.asarray(pred)[None], jnp.asarray(gt)[None])[0])
    theirs = skimage_ssim_numpy(pred, gt)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_compute_metrics_host_api():
    rng = np.random.RandomState(3)
    gt = rng.rand(16, 16, 3).astype(np.float32)
    pred = np.clip(gt + 0.1, 0, 1)
    mae, mse, psnr, ssim_val = compute_metrics(pred, gt)
    assert 0 < mae < 0.2 and 0 < mse < 0.05
    assert np.isfinite(psnr) and -1 <= ssim_val <= 1


def test_uint8_quantization_matches_numpy_astype():
    x = np.random.RandomState(4).rand(1, 9, 9, 3).astype(np.float32) * 1.2 - 0.1
    q = np.asarray(quantize_to_uint8_01(jnp.asarray(x)))
    ref = (np.clip(x, 0, 1) * 255).astype(np.uint8) / 255.0
    np.testing.assert_allclose(q, ref, atol=1e-7)


def test_lr_schedule_table():
    """ref get_lr_lambda (:212-233): 1.0 through 40, linear → 0.0 at 50."""
    for epoch, expected in [(1, 1.0), (40, 1.0), (41, 0.9), (45, 0.5), (49, 0.1), (50, 0.0)]:
        got = float(linear_decay_factor(epoch, 40, 50))
        np.testing.assert_allclose(got, expected, atol=1e-6)

    sched = make_lr_schedule(2e-4, steps_per_epoch=10, epochs=50, decay_start=40)
    np.testing.assert_allclose(float(sched(0)), 2e-4)       # epoch 1
    np.testing.assert_allclose(float(sched(399)), 2e-4)     # epoch 40
    np.testing.assert_allclose(float(sched(400)), 1.8e-4)   # epoch 41
    np.testing.assert_allclose(float(sched(490)), 0.0)      # epoch 50

"""Eval / inference runtime (layers L6/L7 of the reference, SURVEY.md §1)."""

from ircolor_tpu.eval.metrics import (
    compute_metrics,
    batched_metrics,
    ssim_skimage,
    quantize_to_uint8_01,
)
from ircolor_tpu.eval.runner import run_test

__all__ = [
    "compute_metrics",
    "batched_metrics",
    "ssim_skimage",
    "quantize_to_uint8_01",
    "run_test",
]

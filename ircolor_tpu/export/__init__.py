"""Artifact export (layer L7): collages, Top-K copy/ranking, CSVs."""

from ircolor_tpu.export.collage import make_comparison_collage, save_comparison_image
from ircolor_tpu.export.topk import save_best_k_outputs, write_metrics_csv

__all__ = [
    "make_comparison_collage",
    "save_comparison_image",
    "save_best_k_outputs",
    "write_metrics_csv",
]

"""Artifact export (layer L7): collages, Top-K copy/ranking, CSVs, and the
AOT serving artifact (``jax.export`` StableHLO with weights baked in)."""

from ircolor_tpu.export.collage import make_comparison_collage, save_comparison_image
from ircolor_tpu.export.topk import save_best_k_outputs, write_metrics_csv
from ircolor_tpu.export.aot import (
    artifact_has_tpu_kernels,
    export_inference,
    load_exported,
    run_export,
    save_exported,
)

__all__ = [
    "make_comparison_collage",
    "save_comparison_image",
    "save_best_k_outputs",
    "write_metrics_csv",
    "artifact_has_tpu_kernels",
    "export_inference",
    "load_exported",
    "run_export",
    "save_exported",
]

"""Data layer (layer L4 of the reference, SURVEY.md §1).

Host-side KAIST scanning/pairing/decoding (cv2 stays on host for exact
INTER_AREA parity, SURVEY.md §7.3), a threaded prefetch pipeline feeding
device batches, and synthetic KAIST trees for tests/benchmarks.
"""

from ircolor_tpu.data.io import (
    load_ir_image,
    load_rgb_image,
    ir_to_array,
    array_to_rgb_image,
    float01_to_uint8_rgb,
    save_rgb,
)
from ircolor_tpu.data.kaist import (
    collect_kaist_ir_files_from_sets,
    scan_kaist_pairs,
    KAISTPairDataset,
    split_train_val,
)
from ircolor_tpu.data.pipeline import BatchLoader

__all__ = [
    "load_ir_image",
    "load_rgb_image",
    "ir_to_array",
    "array_to_rgb_image",
    "float01_to_uint8_rgb",
    "save_rgb",
    "collect_kaist_ir_files_from_sets",
    "scan_kaist_pairs",
    "KAISTPairDataset",
    "split_train_val",
    "BatchLoader",
]

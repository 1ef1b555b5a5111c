"""Distributed layer: device mesh + GSPMD shardings over ICI.

The reference has no parallelism of any kind (SURVEY.md §2.2) — this layer
is new. Data parallelism is the primary strategy for this workload (pure
conv nets, 11.4M-param generator fits per chip): params are replicated and
the batch is sharded over a 1-D ``data`` mesh axis; XLA/GSPMD inserts the
gradient all-reduces over ICI automatically. Spatial sharding
(``parallel.spatial``) additionally tiles the image H/W axes over the mesh
for resolutions that exceed per-chip HBM — GSPMD's spatial partitioner
handles the conv halo exchanges (SURVEY.md §5 "long-context" row).
"""

from ircolor_tpu.parallel.mesh import (
    make_data_mesh,
    make_train_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    initialize_multihost,
)
from ircolor_tpu.parallel.spatial import (
    make_spatial_mesh,
    spatial_sharding,
    data_spatial_sharding,
    check_spatial_compat,
)

__all__ = [
    "make_data_mesh",
    "make_train_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "initialize_multihost",
    "make_spatial_mesh",
    "spatial_sharding",
    "data_spatial_sharding",
    "check_spatial_compat",
]

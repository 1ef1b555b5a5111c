"""Distributed layer: device mesh + GSPMD shardings over ICI.

The reference has no parallelism of any kind (SURVEY.md §2.2) — this layer
is new. Data parallelism is the one applicable strategy for this workload
(pure conv nets, 11.4M-param generator fits per chip); params are replicated
and the batch is sharded over a 1-D ``data`` mesh axis; XLA/GSPMD inserts the
gradient all-reduces over ICI automatically.
"""

from ircolor_tpu.parallel.mesh import (
    make_data_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    initialize_multihost,
)

__all__ = [
    "make_data_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "initialize_multihost",
]

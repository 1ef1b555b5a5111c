"""Host input pipeline: parallel decode + prefetch → device batches.

The reference feeds the GPU with ``DataLoader(num_workers=4, pin_memory)``
(`/root/reference/Code/ir_colorization.py:1576-1581`). The TPU-native
equivalent here is a thread-pool decode (cv2 releases the GIL) with a
bounded prefetch queue producing stacked NHWC numpy batches, plus helpers to
place global arrays on a data-parallel mesh:

* single-process: ``jax.device_put(batch, NamedSharding(mesh, P('data')))``
* multi-host:     each host decodes only its shard of the global batch and
  forms global arrays via ``jax.make_array_from_process_local_data``
  (SURVEY.md §2.2 table).

Epoch shuffling is seeded per epoch (reproducible, unlike the reference's
unseeded DataLoader shuffle).
"""

from __future__ import annotations

import logging
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import numpy as np

from ircolor_tpu.data.kaist import KAISTPairDataset


def _stack(samples: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    return {
        "ir": np.stack([s["ir"] for s in samples]),
        "rgb": np.stack([s["rgb"] for s in samples]),
    }


def _assemble_native(raw: list, nthreads: int) -> dict[str, np.ndarray]:
    """Fused C++ normalize+flip+stack of raw_item() outputs."""
    from ircolor_tpu.data import native

    flips = [r[2] for r in raw]
    return {
        "ir": native.assemble_batch([r[0] for r in raw], flips, nthreads=nthreads),
        "rgb": native.assemble_batch([r[1] for r in raw], flips, nthreads=nthreads),
    }


class BatchLoader:
    """Iterable over stacked NHWC batches with background decode+prefetch.

    Parameters mirror the reference DataLoader (ref :1576-1581):
    ``shuffle``, ``drop_last``, ``num_workers`` (decode threads). For
    multi-host data parallelism pass ``shard_index/shard_count`` — each host
    then yields only its contiguous slice of every global batch (per-host
    input pipeline; batch_size stays the GLOBAL batch size).
    """

    def __init__(
        self,
        dataset: KAISTPairDataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
        use_native: bool = True,
        transport: str = "float",
    ) -> None:
        if batch_size % shard_count != 0:
            raise ValueError("global batch_size must divide by shard_count")
        if transport not in ("float", "int"):
            raise ValueError(f"transport must be 'float' or 'int', got {transport!r}")
        if transport == "int" and not hasattr(dataset, "int_item"):
            raise TypeError(
                f"transport='int' needs a dataset with int_item(); "
                f"{type(dataset).__name__} has none"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._epoch = 0
        # 'int': uint16 IR + uint8 RGB batches (1/3 the H2D bytes; the jitted
        # step decodes — train/step.py:_decode_transport). Assembly is a
        # flip+stack of integer arrays, so the native f32 assembler is moot.
        self.transport = transport
        if transport == "int" and use_native:
            # Integer transport is a flip+stack of integer arrays — the C++
            # f32 assembler doesn't apply. Say so instead of silently
            # ignoring the caller's use_native.
            logging.getLogger(__name__).debug(
                "BatchLoader: use_native dropped — transport='int' assembles "
                "integer batches in Python (the native assembler is f32-only)"
            )
            use_native = False
        if use_native:
            from ircolor_tpu.data import native

            use_native = native.available() and hasattr(dataset, "raw_item")
        self.use_native = use_native

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)  # per-epoch augmentation stream

    def _batch_indices(self) -> list[list[int]]:
        idxs = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed * 100003 + self._epoch).shuffle(idxs)
        batches = [
            idxs[i : i + self.batch_size]
            for i in range(0, len(idxs), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        elif batches and not batches[-1]:
            batches.pop()
        # Per-host shard: contiguous slice of each global batch. Every host
        # MUST yield the same number of batches — hosts run collectives in
        # lockstep, so a host silently dropping a batch the others keep would
        # desynchronize multi-host validation (drop_last=False). A short final
        # global batch (r < batch_size rows) is therefore split EVENLY across
        # hosts (host h gets rows [h·r/S, (h+1)·r/S)); slices may be EMPTY
        # (r < shard_count) but are still yielded as 0-row batches, and the
        # concatenation of all hosts' slices is exactly the global sequence.
        if self.shard_count > 1:
            per = self.batch_size // self.shard_count
            sliced = []
            for b in batches:
                if len(b) == self.batch_size:
                    lo = self.shard_index * per
                    sliced.append(b[lo : lo + per])
                else:
                    r, s = len(b), self.shard_count
                    lo = self.shard_index * r // s
                    hi = (self.shard_index + 1) * r // s
                    sliced.append(b[lo:hi])
            batches = sliced
        return batches

    def _empty_batch(self) -> dict[str, np.ndarray]:
        """0-row batch with the correct trailing shape/dtype (a host's share
        of a final global batch shorter than shard_count)."""
        h, w = self.dataset.size_hw
        if self.transport == "int":
            return {
                "ir": np.zeros((0, h, w, 1), np.uint16),
                "rgb": np.zeros((0, h, w, 3), np.uint8),
            }
        return {
            "ir": np.zeros((0, h, w, 1), np.float32),
            "rgb": np.zeros((0, h, w, 3), np.float32),
        }

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        batches = self._batch_indices()
        out_q: "queue.Queue[Any]" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce() -> None:
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        if not b:
                            out_q.put(self._empty_batch())
                            continue
                        if self.transport == "int":
                            samples = list(pool.map(self.dataset.int_item, b))
                            out_q.put(_stack(samples))
                            continue
                        if self.use_native:
                            raw = list(pool.map(self.dataset.raw_item, b))
                            if all(r is not None for r in raw):
                                out_q.put(_assemble_native(raw, self.num_workers))
                                continue
                        samples = list(pool.map(self.dataset.__getitem__, b))
                        out_q.put(_stack(samples))
                out_q.put(None)
            except BaseException as exc:  # surface decode errors to consumer
                out_q.put(exc)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer isn't blocked on put() forever.
            while t.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break

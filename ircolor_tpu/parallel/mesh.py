"""Device mesh construction and sharding helpers.

TPU-native data parallelism (SURVEY.md §2.2 "First-class components" table):

* ``make_data_mesh`` — 1-D ``('data',)`` mesh over all (or the first N)
  devices.
* ``batch_sharding`` / ``replicated_sharding`` — NamedShardings for batches
  (sharded on axis 0) and params/opt state (replicated).
* ``shard_batch`` — place a host batch on the mesh: single-process via
  ``jax.device_put``; multi-host via
  ``jax.make_array_from_process_local_data`` (each host contributes its
  slice of the global batch).
* ``initialize_multihost`` — ``jax.distributed.initialize`` wrapper (DCN
  across hosts; ICI within a slice).

Gradient all-reduce is NOT explicit anywhere: jitting the train step with
replicated param shardings and data-sharded batches makes GSPMD insert
``all-reduce`` over ICI (the TPU-native answer to the reference's absent
NCCL/DDP — SURVEY.md §5 last bullet).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(**kwargs: Any) -> None:
    """``jax.distributed.initialize`` for multi-host runs.

    Call BEFORE any other JAX use: ``jax.distributed.initialize`` must run
    pre-backend-init, so this wrapper must not query the backend (e.g.
    ``jax.process_count()``) to decide — pre-init that always reads 1 and
    initializes the backend as a side effect, making the subsequent
    ``initialize()`` raise. With kwargs (coordinator address etc.) it
    initializes with them; with none it attempts the auto-detected
    environment (TPU pod metadata) and no-ops where there is none —
    single-process CPU/single-chip runs land in the except branch."""
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        if kwargs:
            raise  # explicit coordinator args failing is a real error
        # Auto-detection found no multi-host environment (or a backend was
        # already initialized in-process): single-host, nothing to do.


def _pick_devices(devices: list, n: int) -> list:
    """First ``n`` of ``devices`` — but in a MULTI-PROCESS runtime, ``n/P``
    from EACH process's addressable slice, in process order. A naive prefix
    would land the whole mesh on the first hosts' chips, leaving the other
    hosts' ``make_array_from_process_local_data`` contributions with no
    addressable shard (caught by the real-process multihost test: a 4-host
    batch-4 run built a 4-device mesh entirely on hosts 0-1 and the batch
    assembly raised a partition-count mismatch)."""
    nproc = jax.process_count()
    if nproc == 1 or n == len(devices):
        return list(devices)[:n]
    if n % nproc != 0:
        raise ValueError(
            f"a {n}-device data mesh cannot span {nproc} processes evenly"
        )
    per = n // nproc
    by_proc: dict[int, list] = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)
    picked: list = []
    for pi in sorted(by_proc):
        if len(by_proc[pi]) < per:
            raise ValueError(
                f"process {pi} has only {len(by_proc[pi])} of the {per} "
                f"devices its share of the {n}-device mesh needs"
            )
        picked.extend(by_proc[pi][:per])
    return picked


def make_data_mesh(
    n_devices: int = 0, devices: Any = None, batch_size: int | None = None
) -> Mesh:
    """1-D data-parallel mesh. ``n_devices=0`` → all visible devices, shrunk
    to the largest count that divides ``batch_size`` when one is given (a
    batch of 4 on an 8-device host uses a 4-device mesh, etc.). Multi-process
    runs shrink in multiples of the process count so every host keeps an
    equal share of the mesh (see ``_pick_devices``)."""
    if devices is None:
        devices = jax.devices()
    nproc = jax.process_count()
    if n_devices and n_devices > 0:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} data-parallel devices but only "
                f"{len(devices)} are visible"
            )
        devices = _pick_devices(devices, n_devices)
    elif batch_size is not None:
        n = len(devices)
        while n > 1 and (batch_size % n != 0 or n % nproc != 0):
            n -= 1
        if n % nproc != 0:  # n == 1 but nproc > 1: no even split exists
            raise ValueError(
                f"global batch {batch_size} cannot be data-sharded over "
                f"{nproc} processes (needs a mesh size that is a multiple "
                f"of the process count and divides the batch)"
            )
        devices = _pick_devices(devices, n)
    return Mesh(np.asarray(devices), ("data",))


def make_train_mesh(
    dp_devices: int = 0,
    sp_devices: int = 1,
    devices: Any = None,
    batch_size: int | None = None,
) -> Mesh:
    """Training mesh: 1-D ``('data',)``, or 2-D ``('data', 'sp')`` when
    ``sp_devices > 1`` (spatially-sharded training — the image H axis tiled
    over 'sp' with GSPMD halo exchange in BOTH the forward and backward
    convs, for resolutions/batches that exceed per-chip HBM; see
    parallel/spatial.py for the layout rationale). The 'data' extent shrinks
    to the largest count that divides ``batch_size``, exactly like
    ``make_data_mesh``."""
    if sp_devices <= 1:
        return make_data_mesh(dp_devices, devices, batch_size)
    devs = list(devices if devices is not None else jax.devices())
    if dp_devices and dp_devices > 0:
        dp = dp_devices
    else:
        dp = len(devs) // sp_devices
        if batch_size is not None:
            while dp > 1 and batch_size % dp != 0:
                dp -= 1
    dp = max(dp, 1)
    if dp * sp_devices > len(devs):
        raise ValueError(
            f"need {dp}×{sp_devices} devices for the (data, sp) train mesh, "
            f"have {len(devs)}"
        )
    grid = np.asarray(devs[: dp * sp_devices]).reshape(dp, sp_devices)
    return Mesh(grid, ("data", "sp"))


def warmup_mesh_collectives(mesh: Mesh) -> None:
    """Pre-establish the cross-process communicator for ``mesh``'s device
    set with one tiny all-reduce, issued while the processes are still in
    lockstep (right after mesh construction).

    Without this, the first REAL collective fires only after each process
    finishes its own train-step compile — and compile skew across hosts can
    exceed the transport's rendezvous window. Observed on the CPU backend:
    gloo's 30 s GetKeyValue timeout killed the slowest-compiling of 4
    processes (tests/test_parallel.py::test_multihost_real_processes[4]);
    the communicator is cached per device set, so establishing it here makes
    the post-compile first collective skew-tolerant. Single-process: no-op.
    """
    nproc = jax.process_count()
    if nproc == 1 or mesh.size % nproc != 0:
        return
    x = np.ones((mesh.size,), np.float32)
    # Retry across the transport's rendezvous window: a process that arrives
    # early times out waiting for slower peers' keys, but those keys are
    # durable in the KV store — a fresh attempt then succeeds. 4 attempts ≈
    # 2 minutes of tolerated skew on gloo's 30 s window.
    last: Exception | None = None
    for _ in range(4):
        try:
            arr = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(mesh.axis_names)),
                x[: mesh.size // nproc],
            )
            out = jax.jit(
                lambda v: v.sum(), out_shardings=NamedSharding(mesh, P())
            )(arr)
            jax.block_until_ready(out)
            return
        except Exception as exc:  # rendezvous timeout — peers still booting
            last = exc
    raise last
    # NOTE (round 5): do NOT add a second warm-up collective here (e.g.
    # multihost_utils.process_allgather for orbax's barrier context). It
    # was tried and DEADLOCKED: with two different collectives behind
    # independent retry loops, a process whose first attempt timed out can
    # re-issue collective A while its peer has moved on to collective B —
    # and on an ESTABLISHED gloo context a mismatched collective waits
    # without timeout. The orbax-barrier skew (a process-0-only netG
    # export running before the save barrier) is fixed at the source in
    # train/loop.py instead: exports happen AFTER the orbax save, so the
    # cross-process barrier is reached in lockstep.


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding (axis 0 over 'data')."""
    return NamedSharding(mesh, P("data"))


def _batch_spec(mesh: Mesh, v: Any) -> P:
    """PartitionSpec for one batch array: axis 0 on 'data'; when the mesh
    carries an 'sp' axis (spatial training, ``make_train_mesh``), NHWC image
    arrays additionally shard H on 'sp'. Non-image arrays (masks, labels)
    stay batch-sharded only."""
    if "sp" in mesh.axis_names and getattr(v, "ndim", 0) == 4:
        return P("data", "sp")
    return P("data")


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Mapping[str, np.ndarray], mesh: Mesh) -> dict[str, jax.Array]:
    """Place a batch dict on the mesh, sharded along axis 0.

    Single-process: ``batch`` holds the full global batch. Multi-host: each
    process passes its local shard (global_batch/process_count rows) and the
    global array is assembled across hosts.

    On a 2-D ``('data', 'sp')`` train mesh (``make_train_mesh``) image
    arrays are additionally H-sharded on 'sp'. Multi-host note: that layout
    assumes the 'sp' axis spans devices WITHIN each host's addressable set
    (the sensible topology — halo exchange rides ICI); 'sp' across hosts
    would need per-host H pre-slicing, which this helper does not do.
    """
    if jax.process_count() == 1:
        return {
            k: jax.device_put(v, NamedSharding(mesh, _batch_spec(mesh, v)))
            for k, v in batch.items()
        }
    return {
        k: jax.make_array_from_process_local_data(
            NamedSharding(mesh, _batch_spec(mesh, v)), v
        )
        for k, v in batch.items()
    }

"""Subprocess worker for the REAL multi-process multihost test.

Launched N times by ``tests/test_parallel.py::test_multihost_real_processes``
(one OS process per simulated host). Each worker:

* forces the CPU platform with ``--xla_force_host_platform_device_count=K``
  (K fake local devices per host, so the global mesh spans N·K devices),
* joins the cluster through the REAL ``jax.distributed.initialize`` path via
  ``ircolor_tpu.parallel.mesh.initialize_multihost`` (gloo CPU collectives),
* runs ``train_kaist`` for 2 short epochs on a shared synthetic KAIST tree —
  exercising the per-host ``BatchLoader`` slices, the
  ``jax.make_array_from_process_local_data`` global-batch assembly, the
  replicated-scalar validation step, and the process-0-only checkpoint gate
  with no monkeypatching anywhere,
* dumps its view of the run (per-epoch val L1, best val L1, losses) to a
  JSON file the parent test compares across processes.

The reference has no distributed support at all (SURVEY.md §2.2); this is
the TPU-native framework's multi-host layer (BASELINE config 5) under a
genuine multi-process runtime.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--tree", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    # Backend config must precede first backend use (the environment's
    # sitecustomize force-registers a TPU plugin; pin to CPU like
    # tests/conftest.py does).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # Persistent compile cache: the G+D train-step compile is the dominant
    # per-worker cost (minutes under 4-way CPU contention — the source of
    # rendezvous-window flakiness). The round-4 "no cache writes observed"
    # anomaly is ROOT-CAUSED (round 5, /tmp probe committed to docs/PERF.md):
    # (a) JAX hard-codes "only process 0 writes" (jax/_src/compiler.py
    #     _cache_write: "Not writing persistent cache entry since
    #     process_id != 0") — by design, assuming identical keys;
    # (b) but on the multi-process CPU backend the cache key's
    #     accelerator_config component diverges PER PROCESS
    #     (get_topology_for_devices(...).serialize() embeds process-local
    #     state), so non-zero processes compute keys that can never hit
    #     process 0's entries — every run recompiled on N−1 processes.
    # (c) even where (a)+(b) are fixed, the dir config was being CLOBBERED:
    #     `import ircolor_tpu` (below, via parallel.mesh) sets
    #     jax_compilation_cache_dir to the shared TPU-session cache on
    #     package import (ircolor_tpu/__init__.py) — so the worker's
    #     entries landed in ~/.cache/jax_comp_cache, where a home dir
    #     that persists across machines can hold XLA:CPU executables
    #     compiled for DIFFERENT cpu features (observed: "machine type
    #     ... doesn't match ... could lead to SIGILL", and an actual
    #     worker crash loading one). The package respects
    #     IRCOLOR_COMPILE_CACHE_DIR, so set that BEFORE the import and
    #     use a machine-fingerprinted dir (tests/conftest.py applies the
    #     same fingerprint for the main CPU suite).
    # Fix for (b): hash the accelerator config via jax's own documented
    # fallback (_hash_devices — str(device) is identical across processes
    # for the shared global device list). Keys then match across
    # processes, p0's write serves everyone, and a second multihost run
    # compiles in seconds (verified: 2-proc probe, run 2 = zero cache
    # misses on both processes). Test-harness-only patch, guarded so an
    # upstream rename degrades to always-recompile instead of breaking.
    from cachedirs import cpu_cache_dir  # tests/ = the spawned script's dir

    cache_dir = cpu_cache_dir("mh")
    os.environ["IRCOLOR_COMPILE_CACHE_DIR"] = cache_dir
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        import jax._src.cache_key as _cache_key

        _cache_key._hash_accelerator_config = (
            lambda hash_obj, accelerators: _cache_key._hash_devices(
                hash_obj, accelerators
            )
        )
    except (ImportError, AttributeError):  # pragma: no cover
        pass

    from ircolor_tpu.parallel.mesh import initialize_multihost

    # The package import above re-applies its own cache thresholds; restore
    # the worker's (dir already survives via IRCOLOR_COMPILE_CACHE_DIR).
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    initialize_multihost(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == args.local_devices

    from ircolor_tpu.config import Config
    from ircolor_tpu.train.loop import train_kaist

    jsonl_path = os.path.join(args.workdir, f"log_p{args.process_id}.jsonl")
    cfg = Config(
        mode="train",
        img_size=32,
        ngf=8,
        n_blocks=1,
        batch_size=4,
        epochs=args.epochs,
        save_every=1,
        lr_decay_start_epoch=1,
        lambda_perc=0.0,  # structural VGG skip — no tower on the test path
        num_workers=2,
        train_roots=(args.tree,),
        save_dir=os.path.join(args.workdir, "ckpt"),
        jsonl_log=jsonl_path,
    )
    summary = train_kaist(cfg)

    out = {
        "process_id": args.process_id,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "best_val_l1": summary["best_val_l1"],
        "final_epoch_losses": summary["final_epoch_losses"],
        "steps_total": summary["steps_total"],
        "epoch_val_l1": [
            rec["val_l1"]
            for rec in map(json.loads, open(jsonl_path))
            if rec.get("event") == "epoch"
        ],
    }
    with open(
        os.path.join(args.workdir, f"summary_p{args.process_id}.json"), "w"
    ) as f:
        json.dump(out, f)
    print(f"[worker {args.process_id}] OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())

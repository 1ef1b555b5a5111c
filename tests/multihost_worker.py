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
    # RESOLUTION: persistent compile caching is DISABLED in these workers.
    # Three warm-start designs were built and rejected with evidence (all
    # runs solo, docs/PERF.md round 5):
    # * Cross-process sharing (patch the per-process accelerator_config
    #   key component so everyone reads p0's entries): a tiny-jit probe
    #   passed, but the real train step DEADLOCKED on warm runs.
    # * A second warm-up collective for orbax's barrier context:
    #   deadlocks (mismatched retries across two different collectives —
    #   see parallel/mesh.py NOTE).
    # * Per-process dirs + lifting the p0-only write rule: every process
    #   writes/hits its own entries (verified, 292 each), but WARM runs
    #   then fail ~50%: reloading this jax/XLA version's own XLA:CPU AOT
    #   executables trips the target-feature check ("+prefer-no-scatter
    #   is not supported on the host machine" — an XLA pseudo-feature the
    #   host probe doesn't report, logged as a machine-type mismatch with
    #   SIGILL warnings even for same-machine entries), after which the
    #   loading worker sat silent for minutes and missed the peer's gloo
    #   context-init 30 s window (observed: p1 AOT-load warnings at T,
    #   nothing until the shutdown-barrier cascade at T+5:33).
    # Deserializing XLA:CPU executables with collectives is not reliable
    # here, so the workers always compile fresh; robustness rests on the
    # parent's 1500 s communicate() budget (as in round 4) plus the
    # cold-run time itself improving when the machine is idle (~2-3 min
    # for N=2). The SIGILL/foreign-entry hazard this also avoids is real:
    # a worker crash loading a foreign-machine entry from the shared
    # ~/.cache dir started this investigation.
    os.environ["IRCOLOR_NO_COMPILE_CACHE"] = "1"
    jax.config.update("jax_compilation_cache_dir", None)

    from ircolor_tpu.parallel.mesh import initialize_multihost

    # (IRCOLOR_NO_COMPILE_CACHE above also keeps the package import from
    # re-enabling the cache.)
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

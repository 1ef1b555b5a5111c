"""The training driver: data, state, epoch loop, validation, checkpoints.

Reference semantics: ``train_kaist``
(`/root/reference/Code/ir_colorization.py:1549-1723`, trace in SURVEY.md
§3.1): scan KAIST pairs, seed-42 train/val split (val_ratio 0.1), Adam 2e-4
β(0.5,0.999) for G and D, LambdaLR linear decay from epoch 40, per-batch
D-then-G updates, console logging every 50 steps (+ step 1), per-epoch
validation (L1 only), ``netG_epoch_{k:03d}`` checkpoints every 5 epochs +
final, ``netG_best`` on val-L1 improvement, LR print per epoch.

TPU-native deltas: the dataset tree is scanned ONCE (the reference rescans
3×, ref :1555-1573); the whole D+G step is one jitted donated function; the
batch is sharded over a data-parallel mesh (GSPMD all-reduces over ICI);
loss logging fetches device scalars asynchronously; full train state goes to
orbax with ``--resume`` (the reference cannot resume).
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ircolor_tpu.config import Config
from ircolor_tpu.data.kaist import KAISTPairDataset, scan_kaist_pairs, split_train_val
from ircolor_tpu.data.pipeline import BatchLoader
from ircolor_tpu.losses.vgg import VGG16Features, load_vgg16_params
from ircolor_tpu.models.wrapper import merge_params
from ircolor_tpu.parallel.mesh import (
    make_train_mesh,
    replicated_sharding,
    shard_batch,
    warmup_mesh_collectives,
)
from ircolor_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_full_state,
    save_full_state,
    save_netg_export,
)
from ircolor_tpu.train.state import create_train_state
from ircolor_tpu.train.step import make_train_step, make_val_sum_step
from ircolor_tpu.utils.logging import JsonlLogger, get_logger
from ircolor_tpu.utils.timing import start_transfer_warmup

log = get_logger(__name__)


def _check_loss_sanity(m: dict[str, float], cfg: Config, epoch: int, step: int) -> None:
    """Cheap guard on the (already fetched) logged losses: raise on non-finite
    values, and on an absurd early L1 magnitude that indicates the [-1,1]
    input contract (ref :855-862, :1170-1177) was violated upstream — e.g. a
    step variant that forgot to decode the integer batch transport. Inputs in
    [-1,1] bound pixel L1 by 2, so loss_G_L1 ≤ 2·λ_L1 always; raw uint8/uint16
    values push it orders of magnitude past that."""
    bad = [k for k, v in m.items() if not np.isfinite(v)]
    if bad:
        raise FloatingPointError(
            f"Non-finite training losses at epoch {epoch} step {step}: "
            + ", ".join(f"{k}={m[k]}" for k in bad)
        )
    if cfg.lambda_L1 > 0.0 and m.get("loss_G_L1", 0.0) > 2.0 * cfg.lambda_L1 + 1e-6:
        raise FloatingPointError(
            f"loss_G_L1={m['loss_G_L1']:.3f} exceeds the [-1,1]-input bound "
            f"2·lambda_L1={2.0 * cfg.lambda_L1:.3f} at epoch {epoch} step {step}; "
            "inputs are likely not decoded to [-1,1] (check batch_transport handling)"
        )


def train_kaist(
    cfg: Config,
    *,
    max_steps_per_epoch: int | None = None,
    jsonl: JsonlLogger | None = None,
) -> dict[str, Any]:
    """Run the full training recipe. Returns a summary dict (final state,
    best val L1, throughput). ``max_steps_per_epoch`` truncates epochs for
    tests/smoke runs."""
    jsonl = jsonl or JsonlLogger(cfg.jsonl_log)
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    h, w = cfg.resolved_hw
    log.info("[TRAIN] Devices: %s", jax.devices())
    log.info("KAIST root (V000, V001, ...): %s", cfg.kaist_root)  # ref :1552
    # Overlap the backend's first-D2H handshake with the host-side dataset
    # scan, then JOIN before any other device work — concurrent RPCs during
    # state init/compile can wedge relay-attached transports.
    warmup = start_transfer_warmup()

    # ---- data: one scan, seed-42 split (ref :1555-1573 collapses to this) ----
    all_ir, all_rgb = scan_kaist_pairs(list(cfg.train_roots))
    if not all_ir:
        raise RuntimeError(f"No IR-RGB pairs found under roots: {list(cfg.train_roots)}")
    n = len(all_ir)
    train_idx, val_idx = split_train_val(n, cfg.val_ratio, seed=42)
    log.info("Total pairs: %d, train: %d, val: %d", n, len(train_idx), len(val_idx))

    train_ds = KAISTPairDataset(
        [all_ir[i] for i in train_idx], [all_rgb[i] for i in train_idx],
        size_hw=(h, w), augment=True, seed=cfg.seed,
    )
    val_ds = KAISTPairDataset(
        [all_ir[i] for i in val_idx], [all_rgb[i] for i in val_idx],
        size_hw=(h, w), augment=False,
    )
    warmup.join()

    shard_count = max(1, jax.process_count())
    train_loader = BatchLoader(
        train_ds, cfg.batch_size, shuffle=True, drop_last=True,
        num_workers=cfg.num_workers, seed=cfg.seed,
        shard_index=jax.process_index(), shard_count=shard_count,
        transport=cfg.batch_transport,
    )
    val_loader = BatchLoader(
        val_ds, cfg.batch_size, shuffle=False, drop_last=False,
        num_workers=cfg.num_workers,
        shard_index=jax.process_index(), shard_count=shard_count,
        transport=cfg.batch_transport,
    )
    steps_per_epoch = len(train_loader)
    if max_steps_per_epoch is not None:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    if steps_per_epoch == 0:
        raise RuntimeError("Not enough pairs for a single training batch")

    # ---- mesh FIRST (multi-process: establish the communicator while the
    # hosts are still in lockstep — state init below is compile-heavy and
    # its cross-host skew can exceed a transport's collective-rendezvous
    # window; parallel/mesh.py:warmup_mesh_collectives) ----
    if cfg.sp_devices > 1 and cfg.dp_mode != "gspmd":
        raise ValueError(
            "spatially-sharded training (--sp-devices > 1) requires "
            "dp_mode='gspmd' — the shard_map step partitions the batch "
            "axis only"
        )
    mesh = make_train_mesh(
        cfg.dp_devices, cfg.sp_devices, batch_size=cfg.batch_size
    )
    warmup_mesh_collectives(mesh)

    # ---- model / optimizer state ----
    state, g_module, d_module, (opt_g, opt_d) = create_train_state(cfg, steps_per_epoch)
    if cfg.init_G_weights is not None and os.path.isfile(cfg.init_G_weights):
        log.info("Initializing generator from: %s", cfg.init_G_weights)
        from ircolor_tpu.compat.torch_import import load_generator_pth
        from ircolor_tpu.train.checkpoint import load_netg_export

        loaded = (
            load_generator_pth(cfg.init_G_weights)
            if cfg.init_G_weights.endswith((".pth", ".pt"))
            else load_netg_export(cfg.init_G_weights)
        )
        state = state.replace(g_params=merge_params(state.g_params, loaded))

    vgg_module = VGG16Features(dtype=g_module.dtype, precision=g_module.precision)
    if cfg.lambda_perc != 0.0:
        vgg_params = load_vgg16_params(cfg.vgg16_weights, cfg.seed)
        if cfg.vgg16_weights is None:
            log.warning(
                "WARNING: no pretrained VGG-16 weights supplied (cfg.vgg16_weights); "
                "perceptual loss uses a deterministic random tower."
            )
    else:
        # λ_perc == 0 skips the perceptual subgraph structurally (both DP
        # steps); don't decode ~59 MB of tower weights, push them through
        # the host→device link, or hold them in HBM for a dropped argument.
        vgg_params = None

    # ---- mesh placement: params replicated, batches sharded on 'data'
    # (and image H on 'sp' when cfg.sp_devices > 1 — spatially-sharded
    # training for resolutions exceeding per-chip HBM; GSPMD inserts the
    # conv halo exchanges and turns the IN/loss spatial means into
    # cross-shard all-reduces in both the forward and backward) ----
    repl = replicated_sharding(mesh)
    state = jax.device_put(state, repl)
    if vgg_params is not None:
        vgg_params = jax.device_put(vgg_params, repl)

    if cfg.dp_mode == "shard_map":
        from ircolor_tpu.train.step_shardmap import (
            make_train_step_shardmap,
            make_val_sum_step_shardmap,
        )

        train_step = make_train_step_shardmap(
            cfg, g_module, d_module, vgg_module, opt_g, opt_d, mesh
        )
        # Validation goes through shard_map too: same replicated-scalar
        # contract, and it keeps the fused Pallas kernels (which stay
        # enabled under this mode, train/state.py) off the GSPMD path.
        val_step = make_val_sum_step_shardmap(g_module, mesh)
    elif cfg.dp_mode == "gspmd":
        train_step = make_train_step(cfg, g_module, d_module, vgg_module, opt_g, opt_d)
        val_step = make_val_sum_step(g_module)
    else:
        raise ValueError(f"dp_mode must be 'gspmd' or 'shard_map', got {cfg.dp_mode!r}")

    # ---- resume ----
    orbax_dir = cfg.orbax_dir or os.path.join(cfg.save_dir, "orbax")
    start_epoch = 1
    best_val_l1 = float("inf")
    if cfg.resume:
        last = latest_checkpoint(orbax_dir)
        if last is not None:
            state, extra = restore_full_state(orbax_dir, last, jax.device_get(state))
            state = jax.device_put(state, repl)
            start_epoch = int(extra["epoch"]) + 1
            best_val_l1 = float(extra["best_val_l1"])
            log.info("Resumed from epoch %d (best val L1 %.4f)", last, best_val_l1)
            if start_epoch > cfg.epochs:
                log.warning(
                    "Resume checkpoint is at epoch %d but cfg.epochs=%d — "
                    "nothing left to train (raise --epochs to continue).",
                    last, cfg.epochs,
                )

    os.makedirs(cfg.save_dir, exist_ok=True)
    best_stem = os.path.join(cfg.save_dir, "netG_best")

    def run_validation() -> float:
        # Multihost-safe: every host pads its (possibly short, possibly
        # empty) slice of the final batch to the static per-host shape and
        # marks real rows in a mask; the jitted step reduces Σl1/Σmask over
        # the data axis into REPLICATED scalars, so all hosts see the same
        # val L1 (no per-host partial sums → no divergent best-val
        # decisions) and batch counts stay in lockstep (BatchLoader yields
        # the same count on every host, incl. 0-row slices).
        total, count = 0.0, 0.0
        full = val_loader.batch_size // shard_count
        for batch in val_loader:
            bsz = batch["ir"].shape[0]
            mask = np.zeros((full,), np.float32)
            mask[:bsz] = 1.0
            if bsz < full:  # pad to the static shape
                pad = full - bsz
                batch = {
                    k: np.concatenate([v, np.zeros((pad, *v.shape[1:]), v.dtype)])
                    for k, v in batch.items()
                }
            sharded = shard_batch({**batch, "mask": mask}, mesh)
            s, c = val_step(
                state.g_params, {k: sharded[k] for k in ("ir", "rgb")},
                sharded["mask"], state.g_stats,
            )
            # ONE packed D2H fetch per batch (each scalar fetch is a ~35 ms
            # RPC on the relay transport; same rule as the train loop's
            # packed loss fetch).
            sc = np.asarray(jnp.stack([s, c]))
            total += float(sc[0])
            count += float(sc[1])
        return total / max(count, 1.0)

    summary: dict[str, Any] = {}
    steps_total = 0
    t_train0 = time.perf_counter()
    for epoch in range(start_epoch, cfg.epochs + 1):
        # One (K,)-vector of device scalars per step. Packing the 7 loss
        # scalars per step (and fetching chunk-wise at epoch end) keeps the
        # D2H count O(steps/256), not O(7·steps) — each scalar fetch is a
        # ~35 ms RPC on the relay transport (CLAUDE.md).
        metric_keys: tuple[str, ...] | None = None
        epoch_metrics: list[jax.Array] = []
        train_loader.set_epoch(epoch)
        t0 = time.perf_counter()
        profiling = cfg.profile_dir is not None and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(cfg.profile_dir)
        try:
            for i, batch in enumerate(train_loader, start=1):
                if i > steps_per_epoch:
                    break
                state, metrics = train_step(state, shard_batch(batch, mesh), vgg_params)
                if profiling and i >= min(5, steps_per_epoch):
                    jax.block_until_ready(state.step)
                    jax.profiler.stop_trace()
                    profiling = False
                    log.info("Profiler trace (first %d steps) written to %s", i, cfg.profile_dir)
                if metric_keys is None:
                    metric_keys = tuple(metrics)
                epoch_metrics.append(jnp.stack([metrics[k] for k in metric_keys]))
                if i % cfg.log_every == 0 or i == 1:
                    vals = np.asarray(epoch_metrics[-1])  # one packed D2H fetch
                    m = dict(zip(metric_keys, (float(v) for v in vals)))
                    _check_loss_sanity(m, cfg, epoch, i)
                    log.info(
                        "Epoch [%d/%d] Step [%d/%d] D: %.4f | G: %.4f "
                        "(GAN %.4f + L1 %.4f + Perc %.4f + TV %.6f + SSIM %.4f)",
                        epoch, cfg.epochs, i, steps_per_epoch,
                        m["loss_D"], m["loss_G"], m["loss_G_GAN"], m["loss_G_L1"],
                        m["loss_G_perc"], m["loss_G_TV"], m["loss_G_SSIM"],
                    )
        finally:
            if profiling:
                # An exception (e.g. the loss-sanity guard) or an epoch
                # shorter than the 5-step window must not leave the trace
                # running — a still-active profiler poisons any later
                # start_trace in the same process and drops the trace file.
                jax.profiler.stop_trace()
                profiling = False
        jax.block_until_ready(state.step)
        dt = time.perf_counter() - t0
        steps_done = len(epoch_metrics)
        steps_total += steps_done

        if epoch_metrics:
            chunks = [
                np.asarray(jnp.stack(epoch_metrics[j : j + 256]))
                for j in range(0, len(epoch_metrics), 256)
            ]
            means = np.concatenate(chunks, axis=0).mean(axis=0)
            summary["final_epoch_losses"] = {
                k: float(v) for k, v in zip(metric_keys, means)
            }
            avg_d = summary["final_epoch_losses"]["loss_D"]
            avg_g = summary["final_epoch_losses"]["loss_G"]
        else:
            avg_d = avg_g = 0.0
        val_l1 = run_validation()
        sps = steps_done / dt if dt > 0 else 0.0
        log.info(
            "Epoch [%d/%d] DONE | avg D: %.4f | avg G: %.4f | val L1: %.4f "
            "| %.2f steps/s (%.1f frames/s)",
            epoch, cfg.epochs, avg_d, avg_g, val_l1, sps, sps * cfg.batch_size,
        )
        jsonl.log("epoch", epoch=epoch, avg_d=avg_d, avg_g=avg_g, val_l1=val_l1,
                  steps_per_sec=sps)

        # Best-val update BEFORE the full-state checkpoint, so a resume from
        # an epoch that itself set a new best restores the correct
        # best_val_l1 (and a later worse epoch can't overwrite netG_best).
        is_best = val_l1 < best_val_l1
        if is_best:
            best_val_l1 = val_l1
        do_save = epoch % cfg.save_every == 0 or epoch == cfg.epochs
        if do_save:
            # EVERY process calls the orbax save (outside the process-0 gate):
            # orbax runs cross-process barriers internally, so a process-0-only
            # call deadlocks a real multihost runtime — process 0 waits in the
            # barrier, the others wait in the next epoch's collectives (caught
            # by tests/test_parallel.py::test_multihost_real_processes). The
            # device-resident (replicated) state is passed so orbax's array
            # handler picks the writing replica itself. The orbax save runs
            # BEFORE the process-0-only netG exports (round 5): with warm
            # compile caches the epoch races to this point, and a process-0
            # export running first skewed process 1 into orbax's
            # context-INIT barrier past gloo's 30 s window (observed
            # DEADLINE_EXCEEDED at the first save's allgather). Ordering
            # the barrier first reaches it in lockstep; later p0-only file
            # writes only delay ESTABLISHED-context collectives, which wait
            # without timeout.
            save_full_state(
                orbax_dir, epoch, state,
                {"epoch": epoch, "best_val_l1": best_val_l1, "val_l1": val_l1},
            )
        if jax.process_index() == 0:
            if do_save:
                stem = os.path.join(cfg.save_dir, f"netG_epoch_{epoch:03d}")
                # The CLI generator is always the reference's reflect/no-dropout
                # instantiation (models/wrapper.py hardcodes it, like ref :771);
                # the .pth export's variant kwargs stay at those defaults.
                written = save_netg_export(
                    jax.device_get(state.g_params), stem,
                    no_antialias=cfg.no_antialias,
                )
                log.info("Saved generator checkpoint to %s", written[0])
            if is_best:
                save_netg_export(
                    jax.device_get(state.g_params), best_stem,
                    no_antialias=cfg.no_antialias,
                )
                log.info("New best model saved to %s (val L1=%.4f)", best_stem, best_val_l1)

        # LR print (factor computed like the schedule; ref :1720-1721).
        from ircolor_tpu.train.schedule import linear_decay_factor

        next_lr = cfg.lr_G * float(
            linear_decay_factor(epoch + 1, cfg.lr_decay_start_epoch, cfg.epochs)
        )
        log.info("Current LR (G): %.6e", next_lr)

    wall = time.perf_counter() - t_train0
    log.info("Training finished. Best val L1: %.4f, best model: %s", best_val_l1, best_stem)
    summary.setdefault("final_epoch_losses", {})  # resume-past-end runs 0 epochs
    summary.update(
        best_val_l1=best_val_l1,
        epochs_run=max(0, cfg.epochs - start_epoch + 1),
        steps_total=steps_total,
        wall_s=wall,
        steps_per_sec=steps_total / wall if wall > 0 else 0.0,
        state=state,
    )
    return summary

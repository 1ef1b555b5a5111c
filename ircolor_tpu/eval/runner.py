"""Test-mode runner: batched jitted inference + metrics + artifact export.

Reference semantics: ``run_test``
(`/root/reference/Code/ir_colorization.py:1333-1514`) — loads generator
weights (warns and proceeds random if missing, ref :1353-1355), scans
``cfg.test_roots`` (raises if unset, ref :1364-1365), saves predictions in a
mirrored folder tree, computes MAE/MSE/PSNR/SSIM where GT exists (metrics on
the uint8-quantized prediction, ref :1413), saves collages, prints progress
every 50 frames and a final summary, writes ``metrics_test.csv``, and
exports Top-K.

TPU-native redesign (the BASELINE north star asks for batched test-mode
inference): instead of the reference's serial batch-1 loop with per-image
H2D/D2H, frames are decoded on host threads, stacked into fixed-size batches
(last batch padded — static shapes, one compile), and a single jitted
function runs generator forward + uint8 quantization + the full metric suite
on device. Image writing/collaging overlaps the next batch's device step via
a writer thread pool.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ircolor_tpu.config import Config
from ircolor_tpu.data.io import load_ir_image, load_rgb_image, save_rgb
from ircolor_tpu.data.kaist import collect_kaist_ir_files_from_sets
from ircolor_tpu.eval.metrics import batched_metrics, quantize_to_uint8_01
from ircolor_tpu.export.collage import make_comparison_collage, save_comparison_image
from ircolor_tpu.export.topk import save_best_k_outputs, write_metrics_csv
from ircolor_tpu.models.wrapper import IRColorizationModel
from ircolor_tpu.utils.logging import get_logger
from ircolor_tpu.utils.timing import start_transfer_warmup

log = get_logger(__name__)


def make_infer_fn(module: Any, dp_mesh: Any = None):
    """One jitted step: IR [-1,1] → (uint8 RGB prediction, per-image metrics).

    With ``dp_mesh`` (a 1-D ``('data',)`` mesh), the step runs under
    ``jax.shard_map``: each device infers its batch shard independently
    (inference is embarrassingly parallel — no collectives at all), params
    replicated. Because the per-device body sees whole images, the fused
    Pallas kernels stay enabled, unlike a GSPMD formulation (pallas_call has
    no partitioning rule). The global batch must divide by the mesh size.

    Metrics are computed against the quantized prediction (ref :1413 parity).
    ``params`` may be a bare param tree or a full variables dict (with
    ``batch_stats`` for norm="batch" models).

    Inputs may use the integer transport encoding (3.2× less H2D — matters
    on bandwidth-limited links): ``ir`` as uint16 ``round(ir01·65535)`` and
    ``gt01`` as uint8 ``round(gt01·255)``. The integer sample values are
    transported exactly (k/255 == 257k/65535 as rationals; m/65535 for
    16-bit IR); the device-side divide can differ from the host-float path
    by 1 ulp (XLA strength-reduces /c to ·(1/c)), which moves metrics by
    ≲1e-7 — four orders below the 0.05 dB / 0.005 SSIM parity budget —
    and leaves uint8 predictions identical in practice. Float inputs keep
    the original meaning (ir in [-1,1], gt in [0,1]); the dtype dispatch is
    trace-time static.
    """

    def infer(params, ir, gt01):
        if ir.dtype == jnp.uint16:
            ir = ir.astype(jnp.float32) / 65535.0 * 2.0 - 1.0
        elif ir.dtype == jnp.uint8:
            # 8-bit-source batches ride the half-size uint8 transport
            # (k/255 is the exact sample value for an 8-bit source).
            ir = ir.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        if gt01.dtype == jnp.uint8:
            gt01 = gt01.astype(jnp.float32) / 255.0
        variables = params if "params" in params else {"params": params}
        fake = module.apply(variables, ir, train=False)      # (B,H,W,3) [-1,1]
        pred01q = quantize_to_uint8_01((fake + 1.0) / 2.0)
        pred_u8 = (pred01q * 255.0).astype(jnp.uint8)
        metrics = batched_metrics(pred01q, gt01)
        return pred_u8, metrics

    if dp_mesh is None:
        return jax.jit(infer)

    from jax.sharding import PartitionSpec as P

    sharded = jax.shard_map(
        infer,
        mesh=dp_mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(sharded)


def _rebuild_generator(cfg: Config, reason: str, **flag_overrides):
    """Rebuild the inference generator from ``cfg`` with incompatible
    kernel/layout flags overridden (params are flag-independent — identical
    trees either way). ONE home for the rebuild pattern so compat policy
    changes land in one place. Returns (new_cfg, new_module)."""
    import dataclasses

    from ircolor_tpu.models.wrapper import generator_from_config

    log.info("[TEST] %s (params unchanged)", reason)
    new_cfg = dataclasses.replace(cfg, **flag_overrides)
    return new_cfg, generator_from_config(new_cfg)


def _decode_one(entry: tuple[str, str, str], size_hw: tuple[int, int]):
    """Host decode of one frame: IR + (GT RGB | None), plus the integer
    transport encodings (computed HERE, in the decode pool, so the per-frame
    ``rint`` cost parallelizes across workers instead of serializing on the
    dispatch thread). 8-bit IR sources encode to uint8 (half the upload of
    the uint16 form; k/255 is exact); 16-bit to uint16."""
    ir_path, set_name, seq_rel = entry
    ir01, ir_depth = load_ir_image(ir_path, size_hw, return_depth=True)
    base = os.path.basename(ir_path)
    seq_dir = os.path.dirname(os.path.dirname(ir_path))
    vis_dir = os.path.join(seq_dir, "visible")
    gt_path = os.path.join(vis_dir, base)
    gt01 = None
    has_vis_dir = os.path.isdir(vis_dir)
    if has_vis_dir and os.path.isfile(gt_path):
        gt01 = load_rgb_image(gt_path, size_hw)
    out_rel = os.path.join(set_name, seq_rel, base)
    if ir_depth == 8:
        ir_enc = np.rint(ir01 * 255.0).astype(np.uint8)
    else:
        ir_enc = np.rint(ir01 * 65535.0).astype(np.uint16)
    gt_enc = None if gt01 is None else np.rint(gt01 * 255.0).astype(np.uint8)
    return ir01, gt01, out_rel, base, gt_path, has_vis_dir, ir_enc, gt_enc


def run_test(cfg: Config) -> dict[str, Any]:
    """Batched test mode; returns the summary dict (also printed/saved)."""
    log.info("[TEST] Devices: %s", jax.devices())
    # Overlap the backend's first-D2H handshake with the host-side dataset
    # scan, then JOIN before any other device work — concurrent RPCs during
    # model init/compile can wedge relay-attached transports.
    warmup = start_transfer_warmup()

    os.makedirs(cfg.output_dir, exist_ok=True)
    if not cfg.test_roots:
        raise ValueError("cfg.test_roots is empty. Please set cfg.test_roots to KAIST set paths.")
    entries = collect_kaist_ir_files_from_sets(list(cfg.test_roots))
    log.info("Found %d IR images across test sets: %s", len(entries), list(cfg.test_roots))
    warmup.join()

    model = IRColorizationModel(cfg)
    if cfg.test_G_weights is not None and os.path.isfile(cfg.test_G_weights):
        log.info("Loading generator weights from: %s", cfg.test_G_weights)
        model.load_weights(cfg.test_G_weights)
    else:
        log.warning(
            "WARNING: cfg.test_G_weights is None or does not exist; "
            "generator is randomly initialized, results will be meaningless."
        )

    size_hw = cfg.resolved_hw
    bsz = cfg.resolved_test_batch_size

    # Spatial sharding (cfg.sp_devices > 1): image H (and W when
    # cfg.sp_w_devices > 1) tiled over a mesh, params replicated; GSPMD
    # inserts the conv halo exchanges. 2-D H×W tiling is incompatible with
    # the lane-packed output head (GSPMD mispartitions its unpack reshape) —
    # rather than bouncing the user to --no-lanepack, transparently rebuild
    # the generator with lanepack=False (identical params/math, different
    # compute layout) and log it; check_spatial_compat stays as the backstop.
    infer_module = model.module
    sp_mesh = None
    if cfg.sp_w_devices > 1 and cfg.sp_devices <= 1:
        raise ValueError(
            f"sp_w_devices={cfg.sp_w_devices} requires sp_devices > 1 "
            "(the W axis is a factor of the spatial mesh: sp_devices "
            "total devices tiled (sp_devices/sp_w_devices)×sp_w_devices); "
            "set --sp-devices as well"
        )
    if cfg.sp_devices > 1:
        from ircolor_tpu.parallel.spatial import (
            check_spatial_compat,
            make_spatial_mesh,
        )

        if (
            getattr(infer_module, "pallas_block", False)
            or getattr(infer_module, "pallas_norm_blur", False)
            or getattr(infer_module, "pallas_head", False)
        ):
            # The norm-blur tail and 7×7 head kernels compute their own
            # reflect halos from the full image; under spatial sharding each
            # shard would reflect at its local edge — silently wrong, so
            # they fall back to the plain XLA paths (identical params). The
            # fused RESBLOCK kernel has a spatial form: with a 1-D H mesh it
            # runs under shard_map with ppermuted neighbor halo rows +
            # psum'd IN stats (ops/pallas_resblock.
            # resnet_block_pallas_spatial) — wired below after the mesh is
            # built; 2-D (W-tiled) meshes still disable it.
            keep_block = (
                getattr(infer_module, "pallas_block", False)
                and cfg.sp_w_devices <= 1
            )
            cfg, infer_module = _rebuild_generator(
                cfg,
                "spatial sharding: rebuilding generator with "
                "pallas_norm_blur=False / pallas_head=False%s (in-kernel "
                "reflect halos are incompatible with image-axis sharding"
                % (
                    "; fused resblocks available via shard_map halo exchange "
                    "(engage when the PER-SHARD bottleneck clears the area "
                    "gate)" if keep_block else " / pallas_block=False"
                ),
                pallas_block=keep_block, pallas_norm_blur=False,
                pallas_head=False,
            )

        # With 2-D tiling, H is sharded over sp_devices // sp_w_devices
        # ('sp' axis) and W over sp_w_devices ('spw'), so each axis needs
        # only its own divisor.
        h_shards = cfg.sp_devices // max(1, cfg.sp_w_devices)
        if size_hw[0] % h_shards:
            raise ValueError(
                f"img height {size_hw[0]} must divide by the H-shard count "
                f"{h_shards} (sp_devices={cfg.sp_devices} / "
                f"sp_w_devices={cfg.sp_w_devices})"
            )
        if cfg.sp_w_devices > 1:
            if size_hw[1] % cfg.sp_w_devices:
                raise ValueError(
                    f"img width {size_hw[1]} must divide by sp_w_devices={cfg.sp_w_devices}"
                )
            import warnings

            with warnings.catch_warnings():
                # Suppress ONLY the lanepack-hazard advisory (handled by the
                # rebuild below) — unrelated warnings must stay visible.
                warnings.filterwarnings("ignore", message=".*lanepack.*")
                sp_mesh = make_spatial_mesh(cfg.sp_devices, w_devices=cfg.sp_w_devices)
            if getattr(infer_module, "lanepack", False):
                cfg, infer_module = _rebuild_generator(
                    cfg,
                    "2-D spatial tiling: rebuilding generator with "
                    "lanepack=False (lane-packed output head is incompatible "
                    "with W-axis sharding",
                    lanepack=False,
                )
        else:
            sp_mesh = make_spatial_mesh(cfg.sp_devices)
            if getattr(infer_module, "pallas_block", False):
                # Wire the shard_map spatial form of the fused resblocks
                # (1-D H mesh only; see the rebuild above).
                infer_module = infer_module.clone(spatial_mesh=sp_mesh)
        check_spatial_compat(infer_module, sp_mesh)

    # Data-parallel test mode (cfg.dp_devices > 1): batch sharded over a
    # ('data',) mesh via shard_map — each chip colorizes its slice of the
    # batch independently (no collectives), params replicated, fused Pallas
    # kernels intact (per-device bodies see whole images). The reference has
    # no multi-device story at all (serial batch-1 loop, ref :1379-1465).
    dp_mesh = None
    if cfg.dp_devices > 1:
        if sp_mesh is not None:
            raise ValueError(
                "test mode: dp_devices and sp_devices are mutually exclusive "
                "(batch-parallel vs image-spatial sharding; pick one)"
            )
        from ircolor_tpu.parallel.mesh import make_data_mesh

        dp_mesh = make_data_mesh(cfg.dp_devices)
        ndev = dp_mesh.devices.size
        if ndev <= 1:
            dp_mesh = None
        elif bsz % ndev:
            raise ValueError(
                f"test_batch_size {bsz} must divide by dp_devices {ndev} "
                "(each device infers batch/dp_devices whole images)"
            )
        else:
            log.info("[TEST] Data parallel: batch %d over %d devices", bsz, ndev)

    base_infer = make_infer_fn(infer_module, dp_mesh=dp_mesh)

    _MKEYS = ("mae", "mse", "psnr", "ssim")

    @jax.jit
    def infer(params, ir, gt):
        # Stack per-image metrics into ONE device buffer so consume() pays a
        # single D2H fetch instead of four (each fetch is an RPC round-trip
        # on relay-attached transports).
        pred_u8, m = base_infer(params, ir, gt)
        return pred_u8, jnp.stack([m[k] for k in _MKEYS])

    metrics_list: list[dict[str, Any]] = []
    sums = {"mae": 0.0, "mse": 0.0, "psnr": 0.0, "ssim": 0.0}
    count = 0
    best_psnr, best_psnr_sample = -1.0, None
    best_ssim, best_ssim_sample = -1.0, None
    done = 0

    decode_pool = ThreadPoolExecutor(max_workers=max(1, cfg.num_workers))
    # Separate orchestrator thread: decode_batch fans out onto decode_pool,
    # so submitting it to decode_pool itself would deadlock at num_workers=1
    # (the orchestrating task occupies the only worker its map tasks need).
    prefetch_pool = ThreadPoolExecutor(max_workers=1)
    writer_pool = ThreadPoolExecutor(max_workers=max(1, cfg.num_workers))
    write_futures: list[Any] = []

    batches = [entries[i : i + bsz] for i in range(0, len(entries), bsz)]

    def decode_batch(batch):
        return list(decode_pool.map(lambda e: _decode_one(e, size_hw), batch))

    variables = {"params": model.params}
    if model.batch_stats:
        variables["batch_stats"] = model.batch_stats

    # Place params/batches on the spatial mesh (built above, before the
    # jitted infer fn was constructed over the possibly-rebuilt module).
    sp_sharding = None
    if sp_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        from ircolor_tpu.parallel.spatial import spatial_sharding

        sp_sharding = spatial_sharding(sp_mesh, infer_module)
        variables = jax.device_put(variables, NamedSharding(sp_mesh, PartitionSpec()))
        if cfg.sp_w_devices > 1:
            log.info(
                "[TEST] Spatial sharding: H×W over %d×%d devices",
                cfg.sp_devices // cfg.sp_w_devices, cfg.sp_w_devices,
            )
        else:
            log.info("[TEST] Spatial sharding: H over %d devices", cfg.sp_devices)
    dp_sharding = None
    if dp_mesh is not None:
        from ircolor_tpu.parallel.mesh import batch_sharding, replicated_sharding

        dp_sharding = batch_sharding(dp_mesh)
        variables = jax.device_put(variables, replicated_sharding(dp_mesh))

    # Per-stage wall-clock accumulators (dispatch-thread perspective) — the
    # breakdown the e2e number decomposes into (docs/PERF.md):
    #   decode  = waiting on the host decode prefetch (cv2 + rint encode)
    #   h2d     = batch assembly + device_put/dispatch of the jitted step
    #   fetch   = waiting for D2H of pred/metrics (overlapped via
    #             copy_to_host_async issued at dispatch time)
    #   consume = metric bookkeeping + write/collage submission
    stage_s = {"decode": 0.0, "h2d": 0.0, "fetch": 0.0, "consume": 0.0}

    def _write_collage(cfg, out_rel, ir01, pred, gt01, metrics_text):
        collage = make_comparison_collage(
            ir01_hw=ir01,
            pred_u8_hwc=pred,
            gt01_hwc=gt01,
            add_text=cfg.comparison_add_text,
            pad=cfg.comparison_pad,
            font_scale=cfg.comparison_font_scale,
            thickness=cfg.comparison_thickness,
            metrics_text=metrics_text,
        )
        save_comparison_image(cfg, out_rel, collage)

    def consume(decoded, has_gt, pred_dev, m_dev):
        """Materialize one batch's device results and write artifacts."""
        nonlocal count, best_psnr, best_psnr_sample, best_ssim, best_ssim_sample, done
        t0 = time.perf_counter()
        pred_u8 = np.asarray(pred_dev)
        m_stack = np.asarray(m_dev)  # (4, B): one fetch for all metrics
        t1 = time.perf_counter()
        stage_s["fetch"] += t1 - t0
        m = {k: m_stack[i] for i, k in enumerate(_MKEYS)}
        n = len(decoded)
        for j in range(n):
            ir01, gt01, out_rel, base, gt_path, has_vis_dir = decoded[j][:6]
            out_path = os.path.join(cfg.output_dir, out_rel)
            pred = pred_u8[j]
            write_futures.append(writer_pool.submit(save_rgb, out_path, pred))

            psnr_val = ssim_val = None
            if has_gt[j]:
                mae = float(m["mae"][j])
                mse = float(m["mse"][j])
                psnr_val = float(m["psnr"][j])
                ssim_val = float(m["ssim"][j])
                metrics_list.append(
                    {"file": out_rel, "mae": mae, "mse": mse, "psnr": psnr_val, "ssim": ssim_val}
                )
                sums["mae"] += mae
                sums["mse"] += mse
                # Reference-exact accumulation (ref :1425-1431): an inf PSNR
                # (exact uint8 match) is EXCLUDED from the sum but still
                # counted in the denominator — mean_psnr is deliberately
                # biased the same way the reference's is.
                if np.isfinite(psnr_val):
                    sums["psnr"] += psnr_val
                sums["ssim"] += ssim_val
                count += 1
                if np.isfinite(psnr_val) and psnr_val > best_psnr:
                    best_psnr, best_psnr_sample = psnr_val, out_rel
                if ssim_val > best_ssim:
                    best_ssim, best_ssim_sample = ssim_val, out_rel
            elif has_vis_dir:
                log.warning(
                    "[WARN] No GT RGB found for %s at %s; metrics skipped for this image.",
                    base, gt_path,
                )

            if cfg.save_comparisons:
                metrics_text = None
                if psnr_val is not None and ssim_val is not None:
                    metrics_text = f"PSNR={psnr_val:.2f}dB  SSIM={ssim_val:.4f}"
                elif psnr_val is not None:
                    metrics_text = f"PSNR={psnr_val:.2f}dB"
                # Collage BUILD (canvas assembly + cv2 text) moved into the
                # writer pool too — it was ~1/3 of consume time on the
                # dispatch thread.
                write_futures.append(
                    writer_pool.submit(
                        _write_collage, cfg, out_rel, ir01, pred, gt01, metrics_text
                    )
                )

            done += 1
            if done % 50 == 0 or done == len(entries):
                log.info("[%d/%d] %s -> %s", done, len(entries), decoded[j][3], out_path)
        stage_s["consume"] += time.perf_counter() - t1

    # Three-stage pipeline: decode batch i+1 on host threads, dispatch the
    # device step for batch i, and only THEN materialize batch i−1's results
    # (np.asarray forces the D2H) — so host fetch/writes overlap device
    # compute instead of serializing per batch (the reference is fully
    # serial per image, ref :1379-1465).
    pending = prefetch_pool.submit(decode_batch, batches[0]) if batches else None
    in_flight = None
    t_pipeline0 = time.perf_counter()
    t_steady0 = None  # set after the first batch is consumed (excludes compile)
    for bi, batch in enumerate(batches):
        t0 = time.perf_counter()
        decoded = pending.result()
        pending = (
            prefetch_pool.submit(decode_batch, batches[bi + 1])
            if bi + 1 < len(batches)
            else None
        )
        t1 = time.perf_counter()
        stage_s["decode"] += t1 - t0

        # Integer transport (exact; see make_infer_fn): uint8/uint16 IR +
        # uint8 GT cut the per-batch upload 3.2–6.5× vs float32. Frames were
        # already encoded in the decode pool; assembly here is a memcpy
        # stack. IR rides uint8 when the whole batch is 8-bit-source (the
        # KAIST norm), uint16 otherwise (at most two compile-cache entries).
        ir_dt = (
            np.uint8
            if all(d[6].dtype == np.uint8 for d in decoded)
            else np.uint16
        )
        ir_np = np.zeros((bsz, *size_hw, 1), ir_dt)
        gt_np = np.zeros((bsz, *size_hw, 3), np.uint8)
        has_gt = np.zeros((bsz,), bool)
        for j, d in enumerate(decoded):
            ir_enc, gt_enc = d[6], d[7]
            if ir_enc.dtype == ir_dt:
                ir_np[j, :, :, 0] = ir_enc
            else:  # mixed batch: widen the 8-bit frame (k·257/65535 == k/255)
                ir_np[j, :, :, 0] = ir_enc.astype(np.uint16) * 257
            if gt_enc is not None:
                gt_np[j] = gt_enc
                has_gt[j] = True

        ir_dev, gt_dev = jnp.asarray(ir_np), jnp.asarray(gt_np)
        if sp_sharding is not None:
            ir_dev = jax.device_put(ir_dev, sp_sharding)
            gt_dev = jax.device_put(gt_dev, sp_sharding)
        elif dp_sharding is not None:
            ir_dev = jax.device_put(ir_dev, dp_sharding)
            gt_dev = jax.device_put(gt_dev, dp_sharding)
        pred_dev, m_dev = infer(variables, ir_dev, gt_dev)
        # Start the D2H for this batch NOW — it proceeds as soon as the
        # device step finishes, overlapping the next batch's decode/upload
        # instead of serializing inside consume()'s np.asarray.
        try:
            pred_dev.copy_to_host_async()
            m_dev.copy_to_host_async()
        except AttributeError:  # non-jax.Array backends
            pass
        stage_s["h2d"] += time.perf_counter() - t1
        if in_flight is not None:
            consume(*in_flight)
            if t_steady0 is None:
                t_steady0, done_at_steady = time.perf_counter(), done
        in_flight = (decoded, has_gt, pred_dev, m_dev)
    if in_flight is not None:
        consume(*in_flight)

    t_writes0 = time.perf_counter()
    for f in write_futures:
        f.result()
    write_drain_s = time.perf_counter() - t_writes0
    decode_pool.shutdown()
    prefetch_pool.shutdown()
    writer_pool.shutdown()
    t_end = time.perf_counter()
    log.info("Test finished.")
    if done:
        log.info(
            "End-to-end: %d frames in %.1f s (%.1f frames/s incl. first-batch "
            "compile/fetch)", done, t_end - t_pipeline0, done / (t_end - t_pipeline0),
        )
        if t_steady0 is not None and done > done_at_steady:
            rate = (done - done_at_steady) / (t_end - t_steady0)
            log.info("Steady-state (decode+infer+metrics+write): %.1f frames/s", rate)
        log.info(
            "Pipeline stage wait (dispatch-thread ms/frame): decode %.2f | "
            "h2d+dispatch %.2f | d2h fetch %.2f | consume %.2f | "
            "final write drain %.2f",
            1e3 * stage_s["decode"] / done, 1e3 * stage_s["h2d"] / done,
            1e3 * stage_s["fetch"] / done, 1e3 * stage_s["consume"] / done,
            1e3 * write_drain_s / done,
        )

    summary: dict[str, Any] = {"count": count}
    if count > 0:
        mean_mae = sums["mae"] / count
        mean_mse = sums["mse"] / count
        mean_psnr = sums["psnr"] / count
        mean_ssim = sums["ssim"] / count
        summary.update(
            mean_mae=mean_mae, mean_mse=mean_mse, mean_psnr=mean_psnr, mean_ssim=mean_ssim,
            best_psnr=best_psnr, best_psnr_sample=best_psnr_sample,
            best_ssim=best_ssim, best_ssim_sample=best_ssim_sample,
        )
        log.info("\n=== Test Metrics (on images with GT) ===")
        log.info("Count      : %d", count)
        log.info("Mean MAE   : %.6f", mean_mae)
        log.info("Mean MSE   : %.6f", mean_mse)
        log.info("Mean PSNR  : %.4f dB", mean_psnr)
        log.info("Mean SSIM  : %.6f", mean_ssim)
        if best_psnr_sample:
            log.info("Best PSNR  : %.4f (%s)", best_psnr, best_psnr_sample)
        if best_ssim_sample:
            log.info("Best SSIM  : %.6f (%s)", best_ssim, best_ssim_sample)

        metrics_path = os.path.join(cfg.output_dir, "metrics_test.csv")
        write_metrics_csv(metrics_path, metrics_list, count, mean_mae, mean_mse, mean_psnr, mean_ssim)
        log.info("\nMetrics saved to: %s", metrics_path)
        save_best_k_outputs(cfg, metrics_list)
    else:
        log.info("No metrics were computed (no matching GT RGB images found).")
    return summary

"""AOT serving export: the jitted inference step as a serialized artifact.

The reference's only deployment artifact is a ``.pth`` weights file that
requires the full Python model code to use (`/root/reference/Code/
ir_colorization.py:781-789`). The TPU-native serving story is ahead-of-time
export via ``jax.export``: the ENTIRE inference computation — generator
forward with the weights baked in as constants, [-1,1] → uint8 RGB
conversion included — is serialized as a portable StableHLO artifact that a
serving process can deserialize and call with zero model code, and that XLA
compiles for the requested platform(s) at load time.

Shapes are static per the TPU compilation model: one artifact per batch
size (export several; the eval runner's padded-batch convention applies).

Numerics: reloading recompiles the StableHLO, and XLA may fuse/schedule it
differently from the live jitted module — exact on the f32 path (tested),
within bf16 rounding on the bf16 path (measured on v5e at 512×640: uint8
outputs within 8/255 of the live bf16 model, i.e. ordinary bf16
reassociation noise; export the f32 graph when bit-stability across
processes matters more than speed).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_inference(
    module: Any,
    params: Any,
    height: int,
    width: int,
    *,
    batch_size: int = 16,
    input_nc: int = 1,
    platforms: Sequence[str] | None = None,
    keep_pallas: bool = False,
) -> bytes:
    """Serialize ``IR [-1,1] float32 (B,H,W,C) → uint8 RGB`` with weights
    baked in. ``params`` may be a bare param tree or a full variables dict
    (with ``batch_stats`` for norm="batch" models, as make_infer_fn
    accepts). ``platforms`` e.g. ``("tpu",)`` or ``("tpu", "cpu")``; None →
    the default export platform of the current backend.

    ``keep_pallas``: by default the fused Pallas kernels are stripped so
    the artifact is pure StableHLO (portable across XLA/libtpu versions —
    ``jax.export`` refuses ``tpu_custom_call`` because Mosaic binaries
    carry no compatibility guarantee). Pass True for a SAME-FLEET serving
    artifact that keeps the fused kernels (the measured-fastest inference
    path: fused blocks + nb/head, and the int8 fused blocks under
    ``quant_int8``): the export opts in via
    ``DisabledSafetyCheck.custom_call("tpu_custom_call")``, requires
    ``platforms=("tpu",)``, and the artifact must be served on a
    Mosaic-compatible libtpu (re-export on TPU runtime upgrades)."""
    from ircolor_tpu.eval.metrics import quantize_to_uint8_01

    disabled_checks: tuple = ()
    if keep_pallas:
        if platforms is None:
            platforms = ("tpu",)  # the only platform that can run the kernels
        elif tuple(platforms) != ("tpu",):
            raise ValueError(
                "keep_pallas=True artifacts embed tpu_custom_call — only "
                "platforms=('tpu',) can run them"
            )
        disabled_checks = (
            jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        )
    else:
        # Pure-StableHLO artifact: strip the fused kernels. Param trees are
        # identical either way, so stripping changes nothing but lowering.
        strip = {
            f: False
            for f in ("pallas_block", "pallas_norm_blur", "pallas_head", "use_pallas")
            if getattr(module, f, False)
        }
        if strip:
            module = module.clone(**strip)

    variables = params if "params" in params else {"params": params}

    def serve(ir: jnp.ndarray) -> jnp.ndarray:
        fake = module.apply(variables, ir, train=False)
        # Same uint8 convention as the metrics path (ref :1413 pinning).
        return (quantize_to_uint8_01((fake + 1.0) / 2.0) * 255.0).astype(jnp.uint8)

    spec = jax.ShapeDtypeStruct((batch_size, height, width, input_nc), jnp.float32)
    exp = jax_export.export(
        jax.jit(serve),
        platforms=tuple(platforms) if platforms is not None else None,
        disabled_checks=disabled_checks,
    )(spec)
    return exp.serialize()


def save_exported(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_exported(path: str):
    """Deserialize an exported artifact; returns an object whose ``.call(ir)``
    runs the full inference step (compiles on first call)."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def artifact_has_tpu_kernels(blob: bytes) -> bool:
    """True iff the artifact's StableHLO actually CALLS Mosaic kernels.

    Scanning the serialized bytes is wrong: a keep_pallas export embeds the
    literal string "tpu_custom_call" in its DisabledSafetyCheck metadata
    even when every fused-kernel gate stayed off — inspect the deserialized
    MLIR module for real custom_call ops instead."""
    return "tpu_custom_call" in jax_export.deserialize(blob).mlir_module()


def run_export(cfg) -> str:
    """CLI mode="export": load generator weights (``--test-g-weights``, .pth
    or native export) and write the AOT serving artifact to
    ``cfg.export_out``. Returns the output path.

    ``--export-keep-pallas`` embeds the fused Mosaic kernels (same-fleet TPU
    artifact, the fastest serving graph); default is portable pure
    StableHLO. ``--quant-int8`` composes: with keep_pallas the int8 fused
    blocks ride inside the artifact."""
    import os

    from ircolor_tpu.models.wrapper import IRColorizationModel
    from ircolor_tpu.utils.logging import get_logger
    from ircolor_tpu.utils.timing import start_transfer_warmup

    log = get_logger(__name__)
    # Export fetches the full param tree to host (weights become artifact
    # constants) — fire the relay-handshake D2H warmup now so that first
    # fetch doesn't stall 1.5-2.5 min on this environment (CLAUDE.md).
    start_transfer_warmup()
    model = IRColorizationModel(cfg)
    if cfg.test_G_weights is not None and os.path.isfile(cfg.test_G_weights):
        log.info("Loading generator weights from: %s", cfg.test_G_weights)
        model.load_weights(cfg.test_G_weights)
    else:
        log.warning(
            "WARNING: cfg.test_G_weights is None or does not exist; "
            "exporting a randomly initialized generator."
        )
    variables = {"params": model.params}
    if model.batch_stats:
        variables["batch_stats"] = model.batch_stats
    h, w = cfg.resolved_hw
    platforms = (
        tuple(p.strip() for p in cfg.export_platforms.split(","))
        if cfg.export_platforms
        else None
    )
    blob = export_inference(
        model.module, variables, h, w,
        batch_size=cfg.resolved_test_batch_size, input_nc=cfg.input_nc,
        platforms=platforms, keep_pallas=cfg.export_keep_pallas,
    )
    out = cfg.export_out
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save_exported(out, blob)
    has_kernels = cfg.export_keep_pallas and artifact_has_tpu_kernels(blob)
    if cfg.export_keep_pallas and not has_kernels:
        # keep_pallas was requested but no Mosaic kernel traced into the
        # graph (non-TPU backend, f32 dtype, or every area/shape gate off)
        # — the artifact is valid but serves the plain XLA graph; say so
        # instead of advertising a fused artifact that isn't.
        log.warning(
            "WARNING: --export-keep-pallas requested but no fused kernel "
            "engaged for this config (backend/dtype/area gates) — the "
            "artifact is pure StableHLO and serves the XLA graph."
        )
    log.info(
        "Exported %s serving artifact: %s (%.1f MB, %dx%d b%d, platforms=%s)",
        "same-fleet fused-kernel" if has_kernels else "pure-StableHLO",
        out, len(blob) / 1e6, h, w, cfg.resolved_test_batch_size,
        platforms or ("tpu" if cfg.export_keep_pallas else "(backend default)"),
    )
    return out

"""Central configuration.

Mirrors every field of the reference ``Config`` class
(`/root/reference/Code/ir_colorization.py:32-142`) with identical names and
defaults, rebuilt as a frozen dataclass with CLI/JSON overrides instead of
edit-the-source configuration (the reference README documents "no CLI args
required"; we add one).

TPU-native additions (absent in the reference) are grouped at the bottom:
image height/width decoupling (the reference assumes square ``img_size``),
batch inference size, mesh/data-parallel knobs, precision flags, checkpoint
resume, and the Pallas kernel gate.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class Config:
    # ---------- mode ----------
    # "train" => train on KAIST IR→RGB pairs (ref :51)
    # "test"  => colorize IR test sets, compute metrics, save outputs
    mode: str = "test"

    # ---------- model ----------
    img_size: int = 256          # ref :57 (square default; see img_height/width)
    input_nc: int = 1            # ref :60 IR grayscale
    output_nc: int = 3           # ref :61 RGB
    ngf: int = 64                # ref :64
    norm: str = "instance"       # ref :67 ("instance" | "batch" | "none")
    no_antialias: bool = False   # ref :70
    no_antialias_up: bool = False  # ref :71
    n_blocks: int = 9            # ref :771 (hard-coded 9 in the reference)
    # Weight init scheme (ref init_weights :168-198 supports these four;
    # the reference always calls it with 'normal', gain 0.02).
    init_type: str = "normal"    # "normal" | "xavier" | "kaiming" | "orthogonal"
    init_gain: float = 0.02

    # ---------- checkpoints / output dirs ----------
    save_every: int = 5          # ref :73
    save_dir: str = "./Weights/trained/checkpoints_kaist"   # ref :75
    output_dir: str = "./results"                            # ref :76
    test_G_weights: str | None = None                        # ref :77

    # ---------- train data ----------
    train_roots: tuple[str, ...] = (                         # ref :81-86
        "kaist-dataset/versions/1/set00",
        "kaist-dataset/versions/1/set01",
        "kaist-dataset/versions/1/set03",
        "kaist-dataset/versions/1/set04",
    )

    # ---------- training hyperparameters ----------
    batch_size: int = 4          # ref :92 (global batch; sharded over mesh)
    epochs: int = 50             # ref :93
    lr_G: float = 2e-4           # ref :94
    lr_D: float = 2e-4           # ref :95
    beta1: float = 0.5           # ref :96
    beta2: float = 0.999         # ref :97

    # loss weights (ref :100-104)
    lambda_L1: float = 30.0
    lambda_perc: float = 30.0
    lambda_tv: float = 1e-4
    lambda_ssim: float = 2.0
    lambda_gan: float = 0.1

    num_workers: int = 4         # ref :107 (host decode thread count here)
    val_ratio: float = 0.1       # ref :110
    lr_decay_start_epoch: int = 40  # ref :114
    init_G_weights: str | None = None  # ref :117

    # ---------- test data ----------
    test_roots: tuple[str, ...] = (                          # ref :121-124
        "kaist-dataset/versions/1/set02",
        "kaist-dataset/versions/1/set05",
    )

    # ---------- collage / comparisons (ref :127-132) ----------
    save_comparisons: bool = True
    comparison_dirname: str = "Comparisons"
    comparison_add_text: bool = False
    comparison_pad: int = 8
    comparison_font_scale: float = 0.6
    comparison_thickness: int = 2

    # ---------- Top-K export (ref :135-142) ----------
    best50_copy_preds: bool = True
    best50_copy_collages: bool = True
    best50_preds_subdir: str = "colored"
    best50_collages_subdir: str = "collages"
    topk: int = 50
    best50_dirname: str = "Best_50_colored_images"

    # =====================================================================
    # TPU-native additions (no reference equivalent)
    # =====================================================================

    # Non-square resolution support (BASELINE target is 512×640). When set,
    # these override the square img_size; images are resized to (H, W).
    img_height: int | None = None
    img_width: int | None = None

    # Batched test-mode inference (the reference runs batch 1, ref :1379).
    # None → resolution-aware default via ``resolved_test_batch_size``: the
    # round-4 same-process batch re-scan moved the 512×640-class sweet spot
    # to 32 (127.7 vs 124.4 fps) while 256² stays 16 (625.7 vs 598.7) — the
    # product default now dispatches the same batch the bench certifies
    # (VERDICT r4 #5). Set explicitly to pin a batch.
    test_batch_size: int | None = None

    # Precision: "f32" for reference parity, "bf16" for throughput.
    compute_dtype: str = "f32"
    # XLA conv/matmul precision for f32 path ("default" | "highest").
    conv_precision: str = "highest"

    # Host→device batch transport: "int" ships uint16 IR + uint8 RGB (the
    # exact integer sample values, decoded inside the jitted step — 1/3 the
    # bytes, which matters on PCIe and is decisive on relay-attached dev
    # TPUs); "float" ships reference-layout float32 [-1,1] batches.
    batch_transport: str = "int"

    # Data-parallel mesh: number of devices on the 'data' axis (0 = all).
    # Train: the batch is sharded over the mesh (GSPMD or shard_map per
    # dp_mode). Test: values > 1 also engage batch-parallel inference
    # (shard_map over a ('data',) mesh, fused Pallas kernels intact;
    # test_batch_size must divide by it). Mutually exclusive with
    # sp_devices in test mode.
    dp_devices: int = 0
    # Spatial sharding: shard the image H axis over this many devices
    # (parallel/spatial.py; GSPMD halo exchange). 1 = off. For resolutions
    # that exceed per-chip HBM; H must divide evenly. Test mode: the eval
    # runner builds the ('sp',) mesh (fused blocks stay available via their
    # shard_map spatial form). Train mode: the mesh becomes ('data', 'sp')
    # (parallel/mesh.py:make_train_mesh) and GSPMD halo-exchanges BOTH the
    # forward and backward convs; requires dp_mode='gspmd' (fused kernels
    # fall back to the XLA paths — identical params).
    sp_devices: int = 1
    # 2-D spatial tiling: additionally shard the image W axis over this many
    # of the sp_devices (sp_devices must divide by it; the mesh becomes
    # (sp_devices//sp_w_devices) × sp_w_devices H×W tiles). The runner
    # auto-rebuilds the generator with lanepack=False when needed (GSPMD
    # mispartitions the lane-packed output head under 2-D tiling). 1 = off.
    sp_w_devices: int = 1
    # DP implementation: "gspmd" (XLA inserts the gradient all-reduces) or
    # "shard_map" (explicit lax.pmean collectives; instance/none norms only).
    dp_mode: str = "gspmd"

    # Full-train-state checkpointing (orbax) + resume.
    resume: bool = False
    orbax_dir: str | None = None   # defaults to <save_dir>/orbax

    # VGG-16 perceptual tower weights: path to a torchvision vgg16 .pth
    # state_dict; None → deterministic random init (documented fallback:
    # torchvision is unavailable in this environment, so pretrained weights
    # must be supplied externally for loss parity).
    vgg16_weights: str | None = None

    # Rematerialize generator ResNet blocks in the backward pass
    # (jax.checkpoint): caps train-step activation memory at the cost of one
    # extra block forward. Off by default — measured on v5e at 512×640 bf16,
    # b8 fits without it and runs 27.5 vs 23.3 f/s; enable for batches or
    # resolutions that hit the HBM cliff. Inference graphs are unaffected.
    remat: bool = False

    # Lane-packing of small-Cout convs (the outc head). Exact math, a
    # single-chip micro-layout win (−16 ms at 512×640 b16). Turn OFF for
    # 2-D spatial sharding: GSPMD mispartitions the packed-stride conv's
    # unpack reshape when BOTH image axes are sharded (wrong results,
    # detected by tests/test_parallel.py); 1-D spatial and data-parallel
    # sharding are unaffected.
    lanepack: bool = True

    # Pallas fused kernels gate (parity-tested). Default OFF: measured on
    # v5e (r1), the fused IN kernel is within noise of XLA's own fusion in
    # the full generator graph (204 vs 212 fps at 256²/b16) — XLA fuses IN
    # into conv epilogues well. Kept behind this flag per the
    # "only keep kernels that win" rule (SURVEY.md §7.1 step 9).
    use_pallas: bool = False

    # Round-3 fused reflect-conv-IN ResnetBlock kernel
    # (ops/pallas_resblock.py): in-kernel reflect halos + IN at both ends,
    # one HBM pass per conv instead of ~6. INFERENCE-ONLY (the manual-DMA
    # kernel does not autodiff); training forces it off, as does spatially
    # sharded eval (in-kernel halos are per-shard wrong). Default ON — it
    # passed the ship gate: isolated 4.07 vs 5.64 ms/block, in-context
    # full-forward 119.3 vs 126.1 ms (tools/fwdvariants.py, docs/PERF.md
    # round 3); exact math (interpret + on-TPU parity tested). CPU/non-TPU
    # backends silently use the identical-params XLA path.
    pallas_block: bool = True

    # Use the fused-block kernel in the TRAINING step too (requires
    # pallas_block). The kernel is differentiable via a custom_vjp
    # (hand-derived IN backward + the same dgrad/wgrad convs XLA autodiff
    # emits), so training pays the fused forward price. Measured −14.0
    # ms/step (−4.7%) at b8 512×640 bf16, same-process A/B
    # (tools/trainbench.py --variants full,pb_train; docs/PERF.md r3).
    # Auto-disabled on multi-device data-parallel meshes under
    # dp_mode='gspmd' — pallas_call does not GSPMD-partition. Under
    # dp_mode='shard_map' the fused kernels stay ON: the step body runs
    # per-device on its local batch shard, which never splits an image
    # (train/state.py; equivalence tested on the fake 8-device mesh).
    pallas_block_train: bool = True

    # Backward implementation for the fused block's custom_vjp (only
    # meaningful when pallas_block_train keeps the fused blocks on for
    # training).
    # * "xla": closed-form IN backward + the 4 dgrad/wgrad convs XLA
    #   autodiff emits.
    # * "fused": the dgrad side runs as two fused Pallas launches
    #   (ops/pallas_resblock.py:conv3x3_dgrad_fused — IN backward on load,
    #   zero halos in the input DMA, the reflect-pad VJP fold computed
    #   tile-locally in-kernel, ReLU mask + next-IN stats as a free
    #   epilogue, residual add fused); the 2 wgrads stay XLA. No padded dy
    #   tensor and none of the f32 elementwise intermediates reach HBM.
    # * "fused_wg": additionally runs both wgrads as fused launches
    #   (conv3x3_wgrad_fused — z and dy recomputed on load from the saved
    #   raws, reflect halos in-DMA, 3 MXU contractions into a VMEM-resident
    #   (3,3C,C) accumulator); the dgrad launches stop emitting dy, so the
    #   backward's HBM traffic is just the saved tensors read + dn1/dx
    #   written. Exact same math as "xla" (equivalence-tested).
    # Shipped default: "fused_wg" — same-process A/B at b8 512×640 bf16
    # (tools/trainbench.py --variants full,pb_bwd,pb_bwd_wg, docs/PERF.md
    # round-3 session 2): full 268.9 ms/step, pb_bwd 256.3 (−12.6), pb_bwd_wg
    # 247.6 (−21.3, 32.31 f/s) — reproduced across two processes. Only
    # takes effect where the fused blocks engage (pallas_block_train gates,
    # bf16, single-device or shard_map DP).
    pallas_block_bwd: str = "fused_wg"

    # Fused Pallas BACKWARD for the encoder/decoder conv+IN+ReLU segments
    # (ops/pallas_encdec.py — VERDICT r3 next-step #2: the enc/dec backward
    # is ~108 ms of the 243.6 ms train step). down1: fused dgrad + XLA
    # wgrad (its C=64 input leg is below the Mosaic 128-lane DMA
    # constraint); down2 and up1 (skip-concat split as 256+128): fused
    # dgrad AND wgrad. The custom_vjp primal is the same XLA
    # conv+IN+ReLU, so checkpoints/parity are unaffected; training-path
    # knob with the same single-device/shard_map restriction as the other
    # fused kernels. MEASURED NULL (default stays OFF): step-level 285.1
    # vs 243.0/243.3 ms ship sandwich (+41.8); isolated per-segment losses
    # at every tile (down1 +4.1, down2 +2.0, up1 +0.3 — tools/encdecbench
    # .py, docs/PERF.md round 4). The zero-SAME segments lack the two
    # things the blocks' fused backward won on (reflect-pad VJP folds,
    # chained IN-stats epilogues); kept parity-tested as a documented
    # retirement (trainbench `encdec_bwd`).
    pallas_encdec_bwd: bool = False

    # Fuse the down-stage IN-normalize+ReLU+reflect-blur-pool tails into one
    # normalize-on-load Pallas pass each (ops/pallas_blur.py). Differentiable
    # (custom_vjp), identical params. Default ON for INFERENCE — in-context
    # 512×640 b16 A/B: −1.34 ms (run B) / −1.59 ms (run C) vs the fused
    # blocks alone (run A's +0.96 was the pre-fix kernel; docs/PERF.md r3).
    # Same gspmd-multi-device restriction as pallas_block (shard_map DP
    # keeps it on).
    pallas_norm_blur: bool = True

    # TWO gates per fused kernel (both must pass — see docs/PERF.md
    # "launch-size gates"): *_min_area is the PLANE (H·W px) of the stage —
    # the resolution regime; *_min_launch is batch·H·W px — the grid depth
    # one launch sees (batch-1/2 kernels measured losses the plane-only
    # gates let through, while batch-4 XLA has a pathology the kernels fix).
    # nb plane 18000: both 512×640 tails + 256²'s down1 pass, 256²'s down2
    # (16384) doesn't (forcing both at 256² lost +5.41 ms). nb launch
    # 600000: 512×640 b1 (327680) off, b4 down1 (1.31M) / b8 down2 (655360)
    # / 256² b16 down1 (1.05M) on — every measured decision preserved.
    pallas_norm_blur_min_area: int = 18000
    pallas_norm_blur_min_launch: int = 600000

    # In TRAINING the fused tail LOSES (28.20 vs 28.43 f/s ship, b8
    # 512×640, tools/trainbench.py nb_train runs A+B) — the custom_vjp
    # recompute backward costs more than the fused forward saves — so
    # training uses the XLA tails unless this is set (identical params).
    pallas_norm_blur_train: bool = False

    # Replace the down-blurs' autodiff backward (an lhs_dilation=2 depthwise
    # gradient conv + pad-VJP fold — VPU-bound: 8.1 ms down1 + 4.1 ms down2
    # at b8 512×640) with the exact transposed banded matmuls of the matmul
    # blur form (2.8 + 1.1 ms; tools/blurgrad.py). Forward unchanged (honest
    # depthwise — the in-context winner). Training-path knob; cleared for
    # spatially-sharded training (train/state.py) where a banded matmul over
    # the sharded image axis would make GSPMD gather instead of
    # halo-exchange. Shipped ON: same-process step A/B 248.2 → 243.6 ms
    # (−4.6, 32.84 f/s) at b8 512×640 (tools/trainbench.py blur_bwd;
    # isolated VJP deltas were −4.6/−2.9 ms — the usual in-context
    # shrinkage applies).
    blur_matmul_bwd: bool = True

    # Fuse the whole output head (up2's IN-normalize+ReLU, the 3-px reflect
    # pad, and the 7×7 conv) into one Pallas read + lane-packed write
    # (ops/pallas_head.py). Differentiable (custom_vjp), identical params.
    # Default ON for INFERENCE — isolated 6.67 vs 10.74 ms (XLA segment),
    # in-context −1.54 (run B) / −1.61 ms (run C) vs fused blocks alone.
    # Same gspmd-multi-device restriction as pallas_block (shard_map DP
    # keeps it on).
    pallas_head: bool = True
    # Head plane 100000: 512×640 (327680) passes, 256² (65536) doesn't at
    # ANY batch (+7.29 ms forced at b16). Head launch 600000: 512×640 b1
    # (327680: part of the +7.6 ms batch-1 loss) off; b4 (1.31M — inside
    # the all-fused 44-vs-123 ms win over pathological XLA), b8 (2.62M),
    # b16 (5.24M: −1.5..−7.4 ms) on.
    pallas_head_min_area: int = 100000
    pallas_head_min_launch: int = 600000

    # In TRAINING the fused head LOSES (27.92 vs 28.43 f/s ship, b8
    # 512×640, trainbench head_train runs A+B) — training uses the XLA
    # head unless this is set (identical params).
    pallas_head_train: bool = False

    # int8 MXU serving mode (ops/quant.py): the generator's heavy convs run
    # int8×int8→int32 on the MXU's 2× path (394 vs 197 TOPS on v5e) with
    # per-channel weight scales and dynamic per-sample activation scales,
    # both exactly absorbed by the instance norms every quantized site
    # feeds — error is pure int8 rounding noise. Inference-only (training
    # forces it off). None → resolved default via ``resolved_quant_int8``:
    # ON for the bf16 serving path, OFF for the f32 parity/validation path.
    # Promoted from opt-in in round 5 (VERDICT r4 #2) on the measured
    # end-to-end budget: −0.011 dB PSNR / −0.0002 SSIM on a trained
    # checkpoint (docs/int8_budget_r4.json), 4.6× inside the 0.05 dB
    # reference-parity budget, guarded by the automated regression gate
    # (tools/int8budget.py --assert + tests/test_quant.py micro-train
    # gate). Composes with lanepack/DP/spatial sharding and AOT export
    # (pure StableHLO). Set False explicitly for float serving.
    quant_int8: bool | None = None

    # Two round-5 int8 extensions that WON on speed but FAILED the
    # accuracy gate and are therefore opt-in, default OFF (the automated
    # budget gate doing its job — docs/PERF.md r5): with both on, the
    # trained-checkpoint budget read −0.654 dB / −0.0117 SSIM vs the
    # blocks-only int8 default's −0.011 dB / −0.0002. Unlike the resblock
    # quantization (whose rounding noise feeds instance norms that
    # renormalize it away), these two sites sit at the END of the network
    # where 127/6σ fixed-grid noise lands directly on the output image.
    # * quant_fixed_u2: fixed-scale int8 up2 conv (−20.3/−4.1 ms fwd at
    #   b32 512×640; ConcatConv3x3(quant_fixed)).
    # * quant_head: int8 fused 7×7 head (−0.7/−0.9 ms; outc_head_q).
    quant_fixed_u2: bool = False
    quant_head: bool = False

    # AOT serving export (mode="export" / `python -m ircolor_tpu export`,
    # export/aot.py — no reference equivalent; the ref ships bare .pth
    # weights that need the full model source, ref :781-789). Output path
    # for the serialized jax.export artifact; platforms as a comma list
    # ("tpu" / "tpu,cpu", None = current backend's default); keep_pallas
    # embeds the fused Mosaic kernels for a same-fleet TPU artifact (the
    # measured-fastest serving graph — bit-identical uint8 output to the
    # live model, tools/aotcheck.py) instead of portable pure StableHLO.
    export_out: str = "netG_serving.stablehlo"
    export_platforms: str | None = None
    export_keep_pallas: bool = False

    # D-phase batch-concat: run ONE double-batch discriminator
    # forward/backward over [real ‖ fake] instead of two (train/step.py).
    # Exact for instance/none norms (per-sample stats; the hinge terms mean
    # each half independently); BatchNorm configs ignore it (batch stats
    # would mix the halves). Default ON: −2.2 to −2.4 ms/step at b8
    # 512×640, consistent across two processes with a sandwich control
    # (tools/trainbench.py d_two variant re-tests the two-forward form).
    d_concat: bool = True

    # Train log cadence (ref prints every 50 steps + step 1, ref :1687).
    log_every: int = 50

    # Observability (no reference equivalent — SURVEY.md §5):
    # JSONL metrics stream path (None = stdout-only logging).
    jsonl_log: str | None = None
    # jax.profiler trace dir; when set, epoch 1's first steps are traced
    # (TensorBoard/Perfetto viewable).
    profile_dir: str | None = None
    # Numeric sanity: enable jax_debug_nans during training (errors at the
    # first NaN-producing op instead of propagating; SURVEY.md §5's
    # sanitizer equivalent — JAX is functionally pure, so host-pipeline
    # determinism tests + NaN trapping cover the reference's absent
    # race/sanitizer tooling).
    debug_nans: bool = False

    # RNG seed for init/augmentation (the reference seeds only the split
    # with 42, ref :1565; we seed everything for determinism).
    seed: int = 0

    # ------------------------------------------------------------------
    @property
    def kaist_root(self) -> str:
        """Legacy alias for the first train root (ref :89: the reference
        keeps ``kaist_root = train_roots[0]`` for old code paths and prints
        it in the train banner, ref :1552)."""
        return self.train_roots[0] if self.train_roots else ""

    @property
    def resolved_hw(self) -> tuple[int, int]:
        """(H, W) the model runs at — square img_size unless overridden."""
        h = self.img_height if self.img_height is not None else self.img_size
        w = self.img_width if self.img_width is not None else self.img_size
        return h, w

    @property
    def resolved_test_batch_size(self) -> int:
        """Inference batch: explicit value, else the measured per-resolution
        sweet spot — 32 for 512×640-class planes (≥200k px), 16 below
        (round-4 same-process batch re-scan, docs/PERF.md)."""
        if self.test_batch_size is not None:
            return max(1, self.test_batch_size)
        h, w = self.resolved_hw
        return 32 if h * w >= 200_000 else 16

    @property
    def resolved_quant_int8(self) -> bool:
        """Serving quantization: explicit value, else ON for the bf16
        serving path at both probed resolutions — 512×640-class planes
        (fused int8 blocks + fixed-scale up2 + int8 head) and 256²-class
        (≥65k px: int8 th16 blocks + XLA QuantConv enc/dec measured
        −2.8 ms vs float at b16, docs/PERF.md round 5) — and OFF for the
        f32 reference-parity path, for training, and below 256²-class
        planes (unprobed; the bottleneck there sits under the int8
        blocks' 4096-px gate so only the QuantConv fallback would run).
        Accuracy: −0.011 dB PSNR / −0.0002 SSIM end-to-end on a trained
        checkpoint (docs/int8_budget_r4.json), re-gated each round
        (tools/int8budget.py --assert)."""
        if self.quant_int8 is not None:
            return self.quant_int8
        h, w = self.resolved_hw
        return (
            self.compute_dtype == "bf16"
            and self.mode != "train"
            and h * w >= 65_536
        )

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "Config":
        fields = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - fields
        if unknown:
            raise ValueError(f"Unknown config fields: {sorted(unknown)}")
        for key in ("train_roots", "test_roots"):
            if key in raw and isinstance(raw[key], list):
                raw[key] = tuple(raw[key])
        return cls(**raw)

"""ResNet-bottleneck U-Net generator (NHWC Flax).

Reference semantics: ``ResnetUNetGenerator``
(`/root/reference/Code/ir_colorization.py:425-569`) and ``ResnetBlock``
(ref :362-418). Topology at ngf=64, n_blocks=9:

  encoder   c7s1-64 (ReflPad3 + 7×7 conv + IN + ReLU)                 ref :458-463
            down1: 3×3 conv s1 64→128 + IN + ReLU + blur-pool /2      ref :469-474
            down2: 3×3 conv s1 128→256 + IN + ReLU + blur-pool /2     ref :477-482
  bottleneck 9 × ResnetBlock(256)                                     ref :485-490
  decoder   up1: AA-upsample ×2 → concat skip x1 → 3×3 384→128        ref :495-507
            up2: AA-upsample ×2 → concat skip x0 → 3×3 192→64         ref :512-524
            outc: ReflPad3 + 7×7 conv 64→3 + tanh                     ref :527-531

With ``no_antialias`` the down convs use stride 2 directly (ref :468); with
``no_antialias_up`` the upsamples are 3×3 stride-2 transposed convs with
output_padding 1 (ref :495-499). A bilinear align-corners fixup resize runs
when upsampled shapes don't match the skip (ref :555-556, :562-563) — with
static shapes this is a trace-time Python branch, only active for H or W not
divisible by 4.

Output is in [-1, 1] (tanh). The reference forward returns ``(out, None)``
for CUT-signature compatibility (ref :569); here ``__call__`` returns the
image directly and the wrapper preserves the tuple shape where needed.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

import jax
from jax.sharding import PartitionSpec as P

from ircolor_tpu.models.common import (
    ConcatConv3x3,
    Conv,
    LanePackConv,
    Norm,
    QuantConv,
    use_bias_for_norm,
)
from ircolor_tpu.ops.blurpool import blur_downsample, blur_upsample_aa
from ircolor_tpu.ops.padding import pad2d, reflect_pad2d
from ircolor_tpu.ops.pallas_blur import norm_blur_supported, norm_relu_blur_down
from ircolor_tpu.ops.pallas_head import head_supported, outc_head, outc_head_q
from ircolor_tpu.ops.pallas_encdec import conv_in_relu_fused, seg_tile_h
from ircolor_tpu.ops.pallas_kernels import instance_norm_auto
from ircolor_tpu.ops.pallas_resblock import (
    resnet_block_pallas,
    resnet_block_pallas_q,
    resnet_block_pallas_q_spatial,
    resnet_block_pallas_spatial,
)
from ircolor_tpu.ops.resize import bilinear_align_corners


def _pallas_available() -> bool:
    """Mosaic kernels need a TPU backend; elsewhere (CPU dev/tests) the
    models silently use the equivalent XLA ops — interpret mode is reserved
    for the dedicated kernel parity tests."""
    return jax.default_backend() in ("tpu", "axon")


def _fused_dtype_ok(dtype) -> bool:
    """Fused Pallas paths are bf16-only (the perf path): the f32
    parity/validation path keeps two-pass IN stats and
    conv_precision='highest' semantics, which the fused kernels do not
    honor. Tests monkeypatch this to exercise the fused paths in exact-f32
    interpret mode."""
    return dtype == jnp.bfloat16


class _ConvParams(nn.Module):
    """Declares a Conv-compatible (kernel, bias) param pair without applying
    it — the fused-block path consumes raw kernels. Same names, shapes, and
    initializers as ``Conv`` at the same module path, so parameter trees and
    checkpoints are identical whichever path a config selects. The bias is
    declared (checkpoint compat) but unused by the caller: conv bias is
    mathematically inert through instance norm (IN(x + b) ≡ IN(x))."""

    dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", Conv.kernel_init, (3, 3, cin, self.dim))
        if self.use_bias:
            self.param("bias", Conv.bias_init, (self.dim,))
        return k


class _HeadParams(nn.Module):
    """``LanePackConv``-compatible (kernel, bias) params for the 7×7 output
    head without applying the conv — the fused-head path consumes the raw
    kernel and adds the bias in its XLA epilogue. Same names/shapes/inits at
    the same module path ("outc_conv"), so parameter trees and checkpoints
    are identical whichever path a config selects."""

    features: int
    ksize: int = 7

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", Conv.kernel_init, (self.ksize, self.ksize, cin, self.features))
        b = self.param("bias", Conv.bias_init, (self.features,))
        return k, b


def _fused_tile_h(h: int) -> int | None:
    # th=32 measured fastest at the 512×640 bottleneck (4.07 vs 4.59 ms per
    # block at th=16, tools/pallasbench.py round 3); fall back for small H.
    for th in (32, 16, 8, 4):
        if h % th == 0:
            return th
    return None


# Fused-block crossover, gated on TWO quantities (both per kernel launch,
# i.e. per-shard under spatial sharding):
# * PLANE (rows·W px): the resolution regime — 256²'s 4096-px bottleneck
#   loses at every batch (+9.69 ms forced at b16), 512×640's 20480-px wins.
#   Threshold between the measured points.
# * LAUNCH (batch·rows·W px): the grid depth — shallow grids can't pipeline
#   the halo DMAs. Measured at 512×640: b1 loses (q=20480, +1.8 ms,
#   docs/PERF.md batch-1 A/B); b2 (q=40960: all-fused 26.8 vs 55 ms XLA)
#   and b4 (q=81920: 44 vs 123 ms) WIN HUGELY — XLA hits a small-batch
#   pathology at b2–b4 that the kernels sidestep; b8 wins (163840, infer
#   −3.8 ms / train −14 ms); b16 wins. Threshold = the lowest measured win.
# Tests override via the module fields.
_FUSED_MIN_AREA = 12288
_FUSED_MIN_LAUNCH = 40960
# int8 blocks clear a LOWER plane bar than the float ones: at the 256²
# bottleneck (64×64 = 4096 px, b16) the float kernel loses at every tile
# (+1.1..+1.8 ms) but the int8 form WINS (th16: −1.8..−2.8 ms with the
# XLA QuantConv enc/dec — fwdvariants pb_int8_th16*, docs/PERF.md r5).
# Probed at 4096 px; smaller planes fall back.
_QUANT_FUSED_MIN_AREA = 4096
# Smallest per-shard bottleneck plane at which the small-batch band is
# PROBED to win under spatial sharding. Two measured planes:
# * sp=2 at 512×640 → 64×160 = 10240 px: blocks 1.19–1.42× XLA across
#   b2–b6 (tools/r4_band_sp_run.sh, round 4);
# * sp=4 at 512×640 → 32×160 = 5120 px: blocks 1.15–1.30× XLA at
#   b2/b4/b6 (tools/r5b_train_sp_run.sh, round 5 — 128×640 full-model
#   probe, kernels forced past the area gates).
# Gate = the smaller probed boundary; the 15–30% margin budgets the
# ppermute halo cost a real multi-chip run adds. Smaller (unprobed)
# shards still fall back to XLA.
_SP_BAND_MIN_AREA = 5120


def _xla_smallbatch_band(b: int) -> bool:
    """XLA's full-step graphs at batch 2–4 run up to 3.5× slower PER FRAME
    than at b1 or b8+ (512×640: b4 30.7 ms/frame vs b8 8.8; 256²: b4 4.4
    vs b16 1.6 — reproduced across processes and variant order,
    docs/PERF.md round-3 small-batch pathology). Every fused kernel
    measured a win at every probed point in the band, at BOTH resolutions
    — including 256², where they lose at b16 — so inside the band they
    engage regardless of the plane/launch gates (b5–7 interpolated)."""
    return 2 <= b <= 7


class ResnetBlock(nn.Module):
    """pad→3×3 conv→norm→ReLU→[dropout]→pad→3×3 conv→norm, residual add."""

    dim: int
    padding_type: str = "reflect"
    norm: str = "instance"
    use_dropout: bool = False
    use_bias: bool = True
    dtype: Any = jnp.float32
    precision: Any = None
    use_pallas: bool = False
    pallas_block: bool = False  # fused reflect-conv-IN kernel (inference)
    # Backward implementation for the fused block's custom_vjp: "xla"
    # (closed-form IN backward + 4 XLA convs), "fused" (the dgrad side as
    # two fused Pallas launches — ops/pallas_resblock.py:
    # conv3x3_dgrad_fused; wgrads stay XLA), or "fused_wg" (wgrads fused
    # too — conv3x3_wgrad_fused). Training-path knob only.
    pallas_block_bwd: str = "xla"
    pallas_block_min_area: int = _FUSED_MIN_AREA
    pallas_block_min_launch: int = _FUSED_MIN_LAUNCH
    quant_int8: bool = False  # int8 MXU convs (inference serving mode)
    # H-axis spatial sharding for the fused kernel (inference): a 1-D
    # ('sp',)-style Mesh. The block then runs under shard_map — per-shard
    # kernel launches consume ppermuted neighbor halo rows and psum their IN
    # stats (ops/pallas_resblock.resnet_block_pallas_spatial), matching the
    # single-device fused block. Leave None for GSPMD/single-device use.
    spatial_mesh: Any = None
    spatial_axis: str = "sp"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.padding_type in ("reflect", "replicate"):
            pre_pad, conv_pad = self.padding_type, "VALID"
        elif self.padding_type == "zero":
            pre_pad, conv_pad = None, ((1, 1), (1, 1))
        else:
            raise NotImplementedError(f"Padding [{self.padding_type}] is not implemented")
        # Round-to-nearest has zero gradient: the int8 path is inference-only
        # (train/state.py also forces the config flag off for training).
        quant = self.quant_int8 and not train

        def conv(name: str, y: jnp.ndarray) -> jnp.ndarray:
            # NOTE: a border-corrected zero-SAME formulation that avoids
            # materializing the reflect pad exists (models.common.
            # ReflectConv3x3 / ops.conv.conv3x3_reflect, exact + tested) but
            # measured NEUTRAL on v5e (221 vs 217 ms at 16×512×640) — the
            # .at[].add edge updates cost what the pad saves — with a much
            # slower compile, so the materialized pad stays.
            if pre_pad is not None:
                y = pad2d(y, 1, pre_pad)
            if quant:
                return QuantConv(
                    self.dim, 3, padding=conv_pad, use_bias=self.use_bias,
                    dtype=self.dtype, name=name,
                )(y)
            return Conv(
                self.dim,
                (3, 3),
                padding=conv_pad,
                use_bias=self.use_bias,
                dtype=self.dtype,
                precision=self.precision,
                name=name,
            )(y)

        # Round-3 fully fused block: reflect halos in-kernel, IN at both
        # ends, two kernel launches + one elementwise pass for the whole
        # block. Static-shape guard falls back to the XLA path (identical
        # params) when tiling constraints don't hold.
        # Spatial route: inference-only (no custom_vjp through shard_map),
        # 1-D H mesh only (W halos stay in-kernel). A mesh that doesn't
        # match falls back to the XLA path (GSPMD handles its halos).
        sp = (
            self.spatial_mesh is not None
            and not train
            and tuple(self.spatial_mesh.axis_names) == (self.spatial_axis,)
        )
        sp_n = self.spatial_mesh.shape[self.spatial_axis] if sp else 1
        # Under H-axis spatial sharding the kernel tiles the LOCAL shard.
        local_h = x.shape[1] // sp_n if x.shape[1] % sp_n == 0 else 0
        th = _fused_tile_h(local_h) if local_h else None
        # Small planes tile shallower for the int8 kernel: th16 beat th32's
        # default pick and th8 at the 256² bottleneck (r5 probe).
        if (
            quant
            and th is not None
            and local_h * x.shape[2] < _FUSED_MIN_AREA
            and local_h % 16 == 0
        ):
            th = 16
        min_area = (
            min(self.pallas_block_min_area, _QUANT_FUSED_MIN_AREA)
            if quant
            else self.pallas_block_min_area
        )
        if (
            self.norm == "instance"
            and self.pallas_block
            and not self.use_dropout
            and self.padding_type == "reflect"
            and _fused_dtype_ok(self.dtype)
            and th is not None
            and x.shape[2] % 8 == 0
            # Mosaic halo-DMA lane tiling: both conv inputs (x at C=in,
            # raw1 at C=dim) must be 128-aligned or the kernel fails to
            # compile ("Slice shape along dimension 3 must be aligned to
            # tiling (128)") — caught by the r3 verify probe at ngf=8.
            and x.shape[-1] % 128 == 0
            and self.dim % 128 == 0
            # Two-regime gate (see _FUSED_MIN_AREA/_FUSED_MIN_LAUNCH):
            # per-launch plane (resolution regime — per-shard rows under
            # spatial sharding) AND per-launch batch·plane (grid depth) —
            # overridden inside the XLA small-batch pathology band, where
            # the kernel wins at every measured point. Under spatial
            # sharding the band engages down to the PROBED per-shard
            # bottleneck plane (sp=2 at 512×640 → 64×160 = 10240 px:
            # blocks-only beat XLA 1.19–1.42× across b2–b6 at the 256×640
            # shard plane, tools/r4_band_sp_run.sh, docs/PERF.md r4);
            # smaller shards are unprobed and fall back.
            and (
                (local_h * x.shape[2] >= min_area
                 and x.shape[0] * local_h * x.shape[2]
                 >= self.pallas_block_min_launch)
                or (_xla_smallbatch_band(x.shape[0])
                    and (not sp or local_h * x.shape[2] >= _SP_BAND_MIN_AREA))
            )
            and (self.spatial_mesh is None or sp)
            and _pallas_available()
        ):
            k1 = _ConvParams(self.dim, self.use_bias, name="conv1")(x.shape[-1])
            k2 = _ConvParams(self.dim, self.use_bias, name="conv2")(self.dim)
            if sp:
                blk = (
                    resnet_block_pallas_q_spatial
                    if quant
                    else resnet_block_pallas_spatial
                )
                fn = jax.shard_map(
                    functools.partial(blk, axis=self.spatial_axis, tile_h=th),
                    mesh=self.spatial_mesh,
                    in_specs=(
                        P(None, self.spatial_axis, None, None), P(), P()),
                    out_specs=P(None, self.spatial_axis, None, None),
                    check_vma=False,
                )
                return fn(x, k1.astype(self.dtype), k2.astype(self.dtype))
            if quant:
                # int8 serving mode INSIDE the fused schedule: HBM tensors
                # stay bf16, the VMEM tile quantizes on load, the dx-concat
                # contractions run int8×int8→int32 on the MXU's 2× path.
                # In-context 512×640 b16: 105.7 vs 119.6 ms for the bf16
                # kernel (fwdvariants pb_int8, docs/PERF.md r3 run C) — vs
                # the XLA QuantConv fallback below, whose inter-conv
                # quantize epilogues measured NULL.
                return resnet_block_pallas_q(
                    x, k1.astype(self.dtype), k2.astype(self.dtype), tile_h=th
                )
            return resnet_block_pallas(
                x, k1.astype(self.dtype), k2.astype(self.dtype), tile_h=th,
                bwd=self.pallas_block_bwd,
            )

        # Instance norm (the default) routes through the fused Pallas kernel
        # when enabled: conv→IN→ReLU and conv→IN(+residual) each collapse to
        # one HBM pass at VMEM-resident resolutions.
        if (
            self.norm == "instance"
            and self.use_pallas
            and not self.use_dropout
            and _pallas_available()
        ):
            h = conv("conv1", x)
            h = instance_norm_auto(h, relu=True, use_pallas=True)
            h = conv("conv2", h)
            return instance_norm_auto(h, residual=x, use_pallas=True)

        h = conv("conv1", x)
        h = Norm(self.norm, name="norm1")(h, train)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(rate=0.5, deterministic=not train)(h)
        h = conv("conv2", h)
        h = Norm(self.norm, name="norm2")(h, train)
        return x + h


class ResnetUNetGenerator(nn.Module):
    """U-Net encoder/decoder with ResNet bottleneck (see module docstring)."""

    input_nc: int = 1
    output_nc: int = 3
    ngf: int = 64
    norm: str = "instance"
    use_dropout: bool = False
    n_blocks: int = 9
    padding_type: str = "reflect"
    no_antialias: bool = False
    no_antialias_up: bool = False
    dtype: Any = jnp.float32
    precision: Any = None
    use_pallas: bool = False
    pallas_block: bool = False  # fused ResnetBlock kernel (inference-only)
    pallas_block_bwd: str = "xla"  # custom_vjp bwd: xla | fused | fused_wg
    pallas_block_min_area: int = _FUSED_MIN_AREA
    pallas_block_min_launch: int = _FUSED_MIN_LAUNCH
    # Fuse each down-stage IN-normalize+ReLU+reflect-blur-pool tail into one
    # Pallas read + quarter-write (ops/pallas_blur.norm_relu_blur_down;
    # stats stay an XLA reduce). Differentiable (custom_vjp). Same sharding
    # caveats as pallas_block: single-device meshes only.
    pallas_norm_blur: bool = False
    pallas_norm_blur_min_area: int = 0    # plane (H·W px) gate
    pallas_norm_blur_min_launch: int = 0  # launch (batch·H·W px) gate
    # Fused 7×7 output head (IN+ReLU on load, reflect halos in-kernel,
    # lane-packed matmuls — ops/pallas_head.py). Same caveats as
    # pallas_block: single-device meshes only; differentiable (custom_vjp).
    pallas_head: bool = False
    pallas_head_min_area: int = 0    # plane (H·W px) gate
    pallas_head_min_launch: int = 0  # launch (batch·H·W px) gate
    # Swap the down-blurs' autodiff backward (dilated depthwise gradient
    # conv, VPU-bound: 8.1+4.1 ms at b8 512×640) for the exact transposed
    # banded matmuls (2.8+1.1 ms, tools/blurgrad.py). Forward unchanged
    # (the in-context-winning honest depthwise). Off under spatially-
    # sharded training: GSPMD gathers a banded matmul's sharded image axis
    # instead of halo-exchanging it (train/state.py clears the flag).
    blur_matmul_bwd: bool = False
    # Lane-packing of the outc head (exact math, single-chip layout win).
    # Disable for 2-D spatial sharding — GSPMD mispartitions the packed-
    # stride conv's unpack reshape when both image axes are sharded.
    lanepack: bool = True
    # Closed-form analytic backward for the encoder/decoder instance norms
    # (ops/norm.py:instance_norm_cvjp; same primal, exactness-tested).
    # A/B knob for the training path (trainbench in_vjp).
    in_closed_vjp: bool = False
    # Fused Pallas BACKWARD for the encoder/decoder conv+IN+ReLU segments
    # (ops/pallas_encdec.py): down1 (dgrad fused, wgrad XLA — C=64 input
    # leg), down2 and up1 (both fused). Training-path knob; primal stays
    # the XLA conv + one-pass IN + ReLU. Same single-device/shard_map
    # restriction as the other fused kernels.
    pallas_encdec_bwd: bool = False
    # int8 MXU serving mode (ops/quant.py): the heavy convs (down1/down2,
    # all resblock convs, both decoder skip convs) run int8×int8→int32 on
    # the MXU's 2× path with dequantize-exact scales; every quantized site
    # feeds an instance norm, which absorbs the scales exactly — error is
    # pure int8 rounding noise. Inference-only (training forces it off);
    # replaces the fused bf16 resblock kernel when on. The 7×7 heads stay
    # float.
    quant_int8: bool = False
    # Round-5 end-of-network int8 extensions — perf wins that FAILED the
    # accuracy budget gate (−0.654 dB with both on vs −0.011 blocks-only;
    # their quantization noise has no downstream IN to renormalize it).
    # Opt-in, default OFF (Config.quant_fixed_u2 / quant_head).
    quant_fixed_u2: bool = False
    quant_head: bool = False
    # Rematerialize each ResnetBlock in the backward pass (jax.checkpoint):
    # trades one extra block forward for not keeping 4 bottleneck-plane
    # activations per block alive — the lever that avoids the HBM cliff at
    # larger train batches. No effect on inference graphs.
    remat: bool = False
    # 1-D H-axis spatial mesh (('sp',) from parallel.spatial.make_spatial_mesh):
    # when set together with pallas_block, the bottleneck blocks run fused
    # under shard_map with ppermuted halo rows + psum'd IN stats instead of
    # falling back to XLA (inference only — the eval runner wires this for
    # `test --sp-devices N`). All other stages stay GSPMD-sharded.
    spatial_mesh: Any = None
    spatial_axis: str = "sp"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        layers: Any = None,
        encode_only: bool = False,
    ) -> jnp.ndarray:
        # ``layers``/``encode_only`` are accepted-and-ignored for signature
        # parity with the reference's CUT-compatible forward (ref :533-539:
        # "included to keep the call signature compatible ... not used").
        assert self.n_blocks >= 0
        use_bias = use_bias_for_norm(self.norm)
        ngf = self.ngf
        quant = self.quant_int8 and not train  # int8 is inference-only
        # XLA int8 enc/dec convs LOSE when the fused nb/head kernels engage
        # (+3.0 ms at 512×640 b16: fwdvariants int8_ship 106.0 vs int8_nbh
        # 103.0 ms, docs/PERF.md r3 run D) — their dequantize epilogues sit
        # exactly where those kernels' normalize-on-load reads would fuse.
        # When either fused kernel will engage for THIS input (flags + area
        # gates + shape support), keep the XLA convs bf16; int8 then rides
        # inside the fused blocks (resnet_block_pallas_q). Where neither
        # engages (e.g. 256², CPU, --no-pallas-*) the XLA QuantConv path
        # stays on (it won in that context: pb_int8_full 103.6 vs pb_int8
        # 105.7, run C).
        quant_convs = quant
        if quant and _pallas_available() and _fused_dtype_ok(self.dtype):
            bb, bh, bw = x.shape[0], x.shape[1], x.shape[2]
            nb_on = (
                self.pallas_norm_blur
                and self.norm == "instance"
                and not self.no_antialias
                and any(
                    ((hh * ww >= self.pallas_norm_blur_min_area
                      and bb * hh * ww >= self.pallas_norm_blur_min_launch)
                     or _xla_smallbatch_band(bb))
                    and norm_blur_supported((1, hh, ww, cc))
                    for hh, ww, cc in (
                        (bh, bw, ngf * 2),          # down1 tail plane
                        (bh // 2, bw // 2, ngf * 4),  # down2 tail plane
                    )
                )
            )
            head_on = (
                self.pallas_head
                and self.norm == "instance"
                and ((bh * bw >= self.pallas_head_min_area
                      and bb * bh * bw >= self.pallas_head_min_launch)
                     or _xla_smallbatch_band(bb))
                and head_supported((1, bh, bw, ngf))
            )
            if nb_on or head_on:
                quant_convs = False

        def conv(name, feats, ksize, stride=1, padding="VALID", bias=use_bias):
            if quant_convs:
                return QuantConv(
                    feats, ksize, stride=stride, padding=padding,
                    use_bias=bias, dtype=self.dtype, name=name,
                )
            return Conv(
                feats,
                (ksize, ksize),
                strides=(stride, stride),
                padding=padding,
                use_bias=bias,
                dtype=self.dtype,
                precision=self.precision,
                name=name,
            )

        def norm_relu(name, y):
            if self.norm == "instance" and self.use_pallas and _pallas_available():
                return instance_norm_auto(y, relu=True, use_pallas=True)
            y = Norm(self.norm, closed_vjp=self.in_closed_vjp, name=name)(y, train)
            return nn.relu(y)

        # --- encoder ---
        # inc stays UNPACKED (max_p=1): lane-packing it wins isolated
        # (4.9→3.0 ms) but costs +8.1 ms in full-forward context — the
        # unpack reshape degrades the layout its consumers read
        # (tools/fwdvariants.py, docs/PERF.md round 2).
        x0 = reflect_pad2d(x, 3)
        x0 = LanePackConv(
            ngf, 7, use_bias=use_bias, dtype=self.dtype,
            precision=self.precision, max_p=1, name="inc_conv",
        )(x0)
        x0 = norm_relu("inc_norm", x0)                       # (B, H, W, 64)

        def norm_blur_ok(y):
            # Both down-stage tails (IN → ReLU → reflect blur-pool) can fuse
            # into one normalize-on-load kernel pass when the conv OUTPUT is
            # 128-lane-aligned (ngf≥64 ⇒ 128/256) and the plane is large
            # enough; Norm("instance") is param-free so the param tree is
            # identical either way.
            return (
                self.pallas_norm_blur
                and self.norm == "instance"
                and not self.no_antialias
                and _fused_dtype_ok(self.dtype)
                # Two-regime gate (see _FUSED_MIN_AREA/_FUSED_MIN_LAUNCH):
                # plane for the resolution regime, batch·plane for the
                # launch depth (batch-1 kernels measured losses that
                # plane-only gating let through) — overridden inside the
                # XLA small-batch pathology band.
                and (
                    (y.shape[1] * y.shape[2] >= self.pallas_norm_blur_min_area
                     and y.shape[0] * y.shape[1] * y.shape[2]
                     >= self.pallas_norm_blur_min_launch)
                    or _xla_smallbatch_band(y.shape[0])
                )
                and norm_blur_supported(y.shape)
                and _pallas_available()
            )

        stride_d = 2 if self.no_antialias else 1

        def encdec_seg(zs, cout_):
            """(tile_h, wgrad_mode) when the fused-backward segment engages
            for conv(concat(zs)) → IN → ReLU, else None. Training-path only
            (the custom_vjp primal is the same XLA forward); dgrad needs the
            conv OUTPUT lane-aligned, fused wgrad additionally every input
            leg (down1's C=64 leg keeps an XLA weight contraction)."""
            if not (
                train
                and self.pallas_encdec_bwd
                and self.norm == "instance"
                and stride_d == 1
                and _fused_dtype_ok(self.dtype)
                and self.spatial_mesh is None
                and quant_convs is False
                and _pallas_available()
            ):
                return None
            h_, w_ = zs[0].shape[1], zs[0].shape[2]
            if cout_ % 128 != 0 or w_ % 8 != 0:
                return None
            th = seg_tile_h(h_, w_, max(cout_, max(z.shape[-1] for z in zs)))
            if th is None:
                return None
            wmode = (
                "fused"
                if all(z.shape[-1] % 128 == 0 for z in zs)
                else "xla"
            )
            return th, wmode

        seg = encdec_seg((x0,), ngf * 2)
        if seg is not None:
            kd1 = _ConvParams(ngf * 2, use_bias, name="down1_conv")(x0.shape[-1])
            x1 = conv_in_relu_fused(
                seg[1], seg[0], False, (x0,), kd1.astype(self.dtype)
            )
            if not self.no_antialias:
                x1 = blur_downsample(
                    x1, precision=self.precision,
                    matmul_bwd=self.blur_matmul_bwd,
                )  # (B, H/2, W/2, 128)
        else:
            x1 = conv("down1_conv", ngf * 2, 3, stride_d, ((1, 1), (1, 1)))(x0)
            if norm_blur_ok(x1):
                x1 = norm_relu_blur_down(x1, matmul_bwd=self.blur_matmul_bwd)  # (B, H/2, W/2, 128)
            else:
                x1 = norm_relu("down1_norm", x1)
                if not self.no_antialias:
                    x1 = blur_downsample(
                        x1, precision=self.precision,
                        matmul_bwd=self.blur_matmul_bwd,
                    )  # (B, H/2, W/2, 128)

        seg = encdec_seg((x1,), ngf * 4)
        if seg is not None:
            kd2 = _ConvParams(ngf * 4, use_bias, name="down2_conv")(x1.shape[-1])
            x2 = conv_in_relu_fused(
                seg[1], seg[0], False, (x1,), kd2.astype(self.dtype)
            )
            if not self.no_antialias:
                x2 = blur_downsample(
                    x2, precision=self.precision,
                    matmul_bwd=self.blur_matmul_bwd,
                )  # (B, H/4, W/4, 256)
        else:
            x2 = conv("down2_conv", ngf * 4, 3, stride_d, ((1, 1), (1, 1)))(x1)
            if norm_blur_ok(x2):
                x2 = norm_relu_blur_down(x2, matmul_bwd=self.blur_matmul_bwd)  # (B, H/4, W/4, 256)
            else:
                x2 = norm_relu("down2_norm", x2)
                if not self.no_antialias:
                    x2 = blur_downsample(
                        x2, precision=self.precision,
                        matmul_bwd=self.blur_matmul_bwd,
                    )  # (B, H/4, W/4, 256)

        # --- bottleneck ---
        h = x2
        block_cls = (
            nn.remat(ResnetBlock, static_argnums=(2,)) if self.remat else ResnetBlock
        )
        for i in range(self.n_blocks):
            h = block_cls(
                ngf * 4,
                padding_type=self.padding_type,
                norm=self.norm,
                use_dropout=self.use_dropout,
                use_bias=use_bias,
                dtype=self.dtype,
                precision=self.precision,
                use_pallas=self.use_pallas,
                pallas_block=self.pallas_block,
                pallas_block_bwd=self.pallas_block_bwd,
                pallas_block_min_area=self.pallas_block_min_area,
                pallas_block_min_launch=self.pallas_block_min_launch,
                quant_int8=self.quant_int8,
                spatial_mesh=self.spatial_mesh,
                spatial_axis=self.spatial_axis,
                name=f"resblock_{i}",
            )(h, train)

        # --- decoder stage 1 (skip x1) ---
        if self.no_antialias_up:
            y = nn.ConvTranspose(
                ngf * 4,
                (3, 3),
                strides=(2, 2),
                padding=((1, 2), (1, 2)),  # torch k3 s2 p1 output_padding1 ⇒ out = 2·in
                transpose_kernel=True,      # grad-of-conv semantics = torch ConvTranspose2d
                use_bias=use_bias,
                dtype=self.dtype,
                precision=self.precision,
                kernel_init=Conv.kernel_init,
                name="up1_up",
            )(h)
        else:
            y = blur_upsample_aa(h, precision=self.precision)
        if y.shape[1:3] != x1.shape[1:3]:
            y = bilinear_align_corners(y, x1.shape[1:3])     # fixup (ref :555-556)
        # conv over concat([y, x1]) without materializing the 384-ch concat
        # (in the fused-backward path the concat stays unmaterialized too:
        # one dgrad over the full kernel + one wgrad per input leg).
        seg = encdec_seg((y, x1), ngf * 2)
        if seg is not None:
            ku1 = _ConvParams(ngf * 2, use_bias, name="up1_conv")(
                y.shape[-1] + x1.shape[-1]
            )
            y = conv_in_relu_fused(
                seg[1], seg[0], False, (y, x1), ku1.astype(self.dtype)
            )
        else:
            y = ConcatConv3x3(
                ngf * 2, use_bias=use_bias, dtype=self.dtype,
                precision=self.precision, quant_int8=quant_convs, name="up1_conv",
            )(y, x1)
            y = norm_relu("up1_norm", y)

        # --- decoder stage 2 (skip x0) ---
        if self.no_antialias_up:
            y = nn.ConvTranspose(
                ngf * 2,
                (3, 3),
                strides=(2, 2),
                padding=((1, 2), (1, 2)),
                transpose_kernel=True,
                use_bias=use_bias,
                dtype=self.dtype,
                precision=self.precision,
                kernel_init=Conv.kernel_init,
                name="up2_up",
            )(y)
        else:
            y = blur_upsample_aa(y, precision=self.precision)
        if y.shape[1:3] != x0.shape[1:3]:
            y = bilinear_align_corners(y, x0.shape[1:3])     # fixup (ref :562-563)
        # Round-5 int8-coverage result for up2: with fused kernels engaged
        # the FIXED-scale int8 form wins on speed (−20.3/−4.1 ms at
        # 32×512×640; the dynamic amax form LOSES +3.9, and d1/d2/u1 int8
        # measured NULL-to-loss — docs/PERF.md round 5) but FAILED the
        # end-to-end accuracy gate (−0.65 dB with quant_head also on):
        # opt-in via Config.quant_fixed_u2, default float here.
        y = ConcatConv3x3(
            ngf, use_bias=use_bias, dtype=self.dtype,
            precision=self.precision, quant_int8=quant_convs,
            quant_fixed=quant and not quant_convs and self.quant_fixed_u2,
            name="up2_conv",
        )(y, x0)

        # --- output head (bias always on: ref :529 has no bias= kwarg) ---
        # Fused path: up2's IN+ReLU, the 3-px reflect pad, and the 7×7 conv
        # collapse into one Pallas read + packed write (ops/pallas_head.py);
        # Norm("instance") is param-free and _HeadParams mirrors the
        # LanePackConv param layout, so the tree is identical either way.
        if (
            self.pallas_head
            and self.norm == "instance"
            and _fused_dtype_ok(self.dtype)
            # Two-regime gate (see _FUSED_MIN_AREA/_FUSED_MIN_LAUNCH),
            # overridden inside the XLA small-batch pathology band.
            and (
                (y.shape[1] * y.shape[2] >= self.pallas_head_min_area
                 and y.shape[0] * y.shape[1] * y.shape[2]
                 >= self.pallas_head_min_launch)
                or _xla_smallbatch_band(y.shape[0])
            )
            and head_supported(y.shape)
            and _pallas_available()
        ):
            k7, b7 = _HeadParams(self.output_nc, name="outc_conv")(y.shape[-1])
            if quant and self.quant_head:
                # int8 fused head (round 5): same schedule/traffic, int8 2×
                # MXU matmuls — but its output-adjacent quantization noise
                # failed the accuracy gate; opt-in via Config.quant_head.
                y = outc_head_q(y, k7.astype(self.dtype)) + b7.astype(self.dtype)
            else:
                y = outc_head(y, k7.astype(self.dtype)) + b7.astype(self.dtype)
            return jnp.tanh(y)
        y = norm_relu("up2_norm", y)

        # Cout=3 uses 3/128 MXU lanes; lane-packing p output pixels into the
        # feature dim runs the same 7×7 conv at 22.7 → 6.4 ms isolated and
        # wins 16.3 ms in full-forward context (p=32, 16×512×640) — the one
        # packing site that survives in-context validation. Exact math, identical params.
        y = reflect_pad2d(y, 3)
        y = LanePackConv(
            self.output_nc, 7, dtype=self.dtype, precision=self.precision,
            max_p=32 if self.lanepack else 1, name="outc_conv",
        )(y)
        return jnp.tanh(y)

"""Train state: G/D params + optimizer states + step counter.

The reference keeps this implicitly in torch objects (two Adam optimizers,
ref `/root/reference/Code/ir_colorization.py:1601-1604`; LambdaLR schedulers,
ref :1607-1609). Here it is one pytree — jit-donatable, orbax-checkpointable
in full (G+D params, both opt states, step), which the reference cannot do
(it only ever saves netG weights, SURVEY.md §5 checkpoint bullet).

Adam hyperparameters: lr 2e-4 (per-step schedule), β=(0.5, 0.999), eps 1e-8
(torch default) — optax.adam's update rule m̂/(√v̂ + eps) matches torch.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ircolor_tpu.config import Config
from ircolor_tpu.models.discriminator import NLayerDiscriminator
from ircolor_tpu.models.wrapper import generator_from_config
from ircolor_tpu.ops.conv import resolve_precision
from ircolor_tpu.train.schedule import make_lr_schedule


@struct.dataclass
class TrainState:
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray  # int32 scalar
    # BatchNorm running statistics (flax 'batch_stats'); empty dicts for the
    # default instance norm (which is stateless, PyTorch-default affine=False).
    g_stats: Any = struct.field(default_factory=dict)
    d_stats: Any = struct.field(default_factory=dict)


def discriminator_from_config(cfg: Config, *, dtype=None) -> NLayerDiscriminator:
    """PatchGAN on concat(IR, RGB) (ref :1590-1598)."""
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bf16" else jnp.float32
    return NLayerDiscriminator(
        input_nc=cfg.input_nc + cfg.output_nc,
        ndf=64,
        n_layers=3,
        norm=cfg.norm,
        dtype=dtype,
        precision=resolve_precision(cfg.conv_precision if cfg.compute_dtype == "f32" else "default"),
    )


def make_optimizers(cfg: Config, steps_per_epoch: int) -> tuple[optax.GradientTransformation, optax.GradientTransformation]:
    sched_g = make_lr_schedule(cfg.lr_G, steps_per_epoch, cfg.epochs, cfg.lr_decay_start_epoch)
    sched_d = make_lr_schedule(cfg.lr_D, steps_per_epoch, cfg.epochs, cfg.lr_decay_start_epoch)
    opt_g = optax.adam(sched_g, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)
    opt_d = optax.adam(sched_d, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)
    return opt_g, opt_d


def create_train_state(
    cfg: Config,
    steps_per_epoch: int,
    rng: jax.Array | None = None,
) -> tuple[TrainState, Any, Any, tuple[optax.GradientTransformation, optax.GradientTransformation]]:
    """Init G/D params (N(0,0.02) scheme baked into the modules) + opts.

    Returns (state, g_module, d_module, (opt_g, opt_d)).
    """
    if rng is None:
        rng = jax.random.PRNGKey(cfg.seed)
    rng_g, rng_d = jax.random.split(rng)
    h, w = cfg.resolved_hw
    if cfg.resolved_quant_int8 or cfg.quant_int8 is None:
        # int8 round-to-nearest has zero gradient — training always runs the
        # float convs (identical params; a float-trained checkpoint serves
        # quantized).
        cfg = cfg.replace(quant_int8=False)
    # nb / head kernels measured WORSE in training (trainbench nb_train /
    # head_train, docs/PERF.md r3 runs A+B): default to the XLA paths for
    # the train step unless their explicit train flags are set (identical
    # params — checkpoints from either path load into the other).
    if cfg.pallas_norm_blur and not cfg.pallas_norm_blur_train:
        cfg = cfg.replace(pallas_norm_blur=False)
    if cfg.pallas_head and not cfg.pallas_head_train:
        cfg = cfg.replace(pallas_head=False)
    if (
        (cfg.pallas_block and cfg.pallas_block_train)
        or cfg.pallas_norm_blur
        or cfg.pallas_head
        or cfg.pallas_encdec_bwd
    ):
        # pallas_call cannot be GSPMD-partitioned: on a multi-device
        # data-parallel mesh under dp_mode='gspmd' the fused kernels inside
        # the jitted step would force gathers (or fail to lower), so that
        # path falls back to the XLA blocks (identical params either way).
        # Under dp_mode='shard_map' the step body runs PER-DEVICE on its
        # local batch shard — batch sharding never splits an image, so the
        # fused kernels (and their in-kernel reflect halos / per-sample IN
        # stats) compose with multi-device DP and stay enabled
        # (train/step_shardmap.py provides the matching shard_map val step).
        from ircolor_tpu.parallel.mesh import make_data_mesh

        multi = make_data_mesh(cfg.dp_devices, batch_size=cfg.batch_size).devices.size > 1
        # Spatial training (sp_devices > 1) splits images across devices —
        # the in-kernel reflect halos are per-shard wrong under GSPMD and
        # the shard_map train step has no spatial form, so the fused
        # kernels are off regardless of dp_mode.
        if cfg.sp_devices > 1 or (multi and cfg.dp_mode != "shard_map"):
            cfg = cfg.replace(
                pallas_block_train=False, pallas_norm_blur=False,
                pallas_head=False, pallas_encdec_bwd=False,
            )
    if cfg.sp_devices > 1 and cfg.blur_matmul_bwd:
        # The matmul blur-backward contracts over the image axes; under
        # spatial sharding GSPMD would gather the sharded axis instead of
        # halo-exchanging (the depthwise backward's conv form shards fine).
        cfg = cfg.replace(blur_matmul_bwd=False)
    if cfg.pallas_block and not cfg.pallas_block_train:
        # The fused-block kernel trains through a custom_vjp (see
        # ops/pallas_resblock.py:resnet_block_pallas); without the train
        # flag (or on a multi-device mesh) training uses the XLA block
        # (identical params — checkpoints from either path load into the
        # other).
        cfg = cfg.replace(pallas_block=False)
    g_module = generator_from_config(cfg)
    d_module = discriminator_from_config(cfg)
    g_vars = g_module.init(rng_g, jnp.zeros((1, h, w, cfg.input_nc), jnp.float32))
    d_vars = d_module.init(
        rng_d, jnp.zeros((1, h, w, cfg.input_nc + cfg.output_nc), jnp.float32)
    )
    g_params, d_params = g_vars["params"], d_vars["params"]
    # N(0, 0.02) is baked into module init — but only at the DEFAULT gain;
    # a non-default init_gain must reinit even for init_type='normal'
    # (the reference's init_weights always applies the configured gain).
    if cfg.init_type != "normal" or cfg.init_gain != 0.02:
        from ircolor_tpu.models.common import reinit_params

        ri_g, ri_d = jax.random.split(jax.random.fold_in(rng, 1))
        g_params = reinit_params(g_params, ri_g, cfg.init_type, cfg.init_gain)
        d_params = reinit_params(d_params, ri_d, cfg.init_type, cfg.init_gain)
    opt_g, opt_d = make_optimizers(cfg, steps_per_epoch)
    state = TrainState(
        g_params=g_params,
        d_params=d_params,
        g_opt=opt_g.init(g_params),
        d_opt=opt_d.init(d_params),
        step=jnp.zeros((), jnp.int32),
        g_stats=g_vars.get("batch_stats", {}),
        d_stats=d_vars.get("batch_stats", {}),
    )
    return state, g_module, d_module, (opt_g, opt_d)

"""Generator wrapper: construction from Config, weight loading, jitted forward.

Reference semantics: ``IRColorizationModel``
(`/root/reference/Code/ir_colorization.py:757-796`) — builds the generator
with n_blocks=9 / dropout off (ref :767-775), initializes N(0, 0.02)
(ref :778-779), loads checkpoints permissively (raw state_dict or
``{'state_dict': ...}``, non-strict; ref :781-789), and maps IR [-1,1] →
RGB [-1,1] (ref :791-796).

Here weight loading accepts:
  * PyTorch ``.pth`` files (via ``ircolor_tpu.compat.torch_import``), and
  * this framework's native checkpoints (orbax / msgpack netG exports).
Loading is permissive like the reference: missing keys keep their random
init, extra keys are ignored, with a warning either way.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ircolor_tpu.config import Config
from ircolor_tpu.models.generator import ResnetUNetGenerator
from ircolor_tpu.ops.conv import resolve_precision
from ircolor_tpu.utils.logging import get_logger

log = get_logger(__name__)


def generator_from_config(cfg: Config, *, dtype=None) -> ResnetUNetGenerator:
    """Build the generator module per cfg (ref :767-775)."""
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bf16" else jnp.float32
    return ResnetUNetGenerator(
        input_nc=cfg.input_nc,
        output_nc=cfg.output_nc,
        ngf=cfg.ngf,
        norm=cfg.norm,
        use_dropout=False,
        n_blocks=cfg.n_blocks,
        padding_type="reflect",
        no_antialias=cfg.no_antialias,
        no_antialias_up=cfg.no_antialias_up,
        dtype=dtype,
        precision=resolve_precision(cfg.conv_precision if cfg.compute_dtype == "f32" else "default"),
        use_pallas=cfg.use_pallas,
        pallas_block=cfg.pallas_block,
        pallas_block_bwd=cfg.pallas_block_bwd,
        pallas_encdec_bwd=cfg.pallas_encdec_bwd,
        pallas_norm_blur=cfg.pallas_norm_blur,
        pallas_norm_blur_min_area=cfg.pallas_norm_blur_min_area,
        pallas_norm_blur_min_launch=cfg.pallas_norm_blur_min_launch,
        pallas_head=cfg.pallas_head,
        pallas_head_min_area=cfg.pallas_head_min_area,
        pallas_head_min_launch=cfg.pallas_head_min_launch,
        lanepack=cfg.lanepack,
        blur_matmul_bwd=cfg.blur_matmul_bwd,
        quant_int8=cfg.resolved_quant_int8,
        quant_fixed_u2=cfg.quant_fixed_u2,
        quant_head=cfg.quant_head,
        remat=cfg.remat,
    )


def merge_params(init_params: Any, loaded: Any) -> Any:
    """Non-strict merge mirroring ``load_state_dict(strict=False)`` (ref :789).

    Leaves present in both (with matching shapes) come from ``loaded``;
    everything else keeps its initialized value.
    """
    flat_init = jax.tree_util.tree_flatten_with_path(init_params)[0]
    flat_loaded = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(loaded)[0]
    }
    missing, used = [], set()

    def pick(kp, v):
        key = jax.tree_util.keystr(kp)
        if key in flat_loaded and flat_loaded[key].shape == v.shape:
            used.add(key)
            return jnp.asarray(flat_loaded[key], dtype=v.dtype)
        missing.append(key)
        return v

    merged = jax.tree_util.tree_map_with_path(pick, init_params)
    unexpected = sorted(set(flat_loaded) - used)
    if missing:
        log.warning("load_weights: %d params kept their init (missing in ckpt): %s",
                    len(missing), missing[:5])
    if unexpected:
        log.warning("load_weights: %d ckpt entries unused: %s", len(unexpected), unexpected[:5])
    return merged


class IRColorizationModel:
    """Holds the generator module + params and a jitted forward."""

    def __init__(self, cfg: Config, rng: jax.Array | None = None):
        self.cfg = cfg
        self.module = generator_from_config(cfg)
        if rng is None:
            rng = jax.random.PRNGKey(cfg.seed)
        h, w = cfg.resolved_hw
        dummy = jnp.zeros((1, h, w, cfg.input_nc), jnp.float32)
        variables = self.module.init(rng, dummy)
        self.params = variables["params"]
        # N(0, 0.02) is baked into module init at the DEFAULT gain only; a
        # non-default init_gain must reinit even for init_type='normal'.
        if cfg.init_type != "normal" or cfg.init_gain != 0.02:
            from ircolor_tpu.models.common import reinit_params

            self.params = reinit_params(
                self.params, jax.random.fold_in(rng, 1), cfg.init_type, cfg.init_gain
            )
        # BatchNorm running stats (norm="batch" only; instance norm is stateless).
        self.batch_stats = variables.get("batch_stats", {})

    def load_weights(self, path: str) -> None:
        """Load generator weights from .pth / native export (non-strict)."""
        if not os.path.isfile(path):
            raise FileNotFoundError(path)
        if path.endswith(".pth") or path.endswith(".pt"):
            from ircolor_tpu.compat.torch_import import load_generator_pth

            loaded = load_generator_pth(path)
        else:
            from ircolor_tpu.train.checkpoint import load_netg_export

            loaded = load_netg_export(path)
        self.params = merge_params(self.params, loaded)

    @partial(jax.jit, static_argnums=0)
    def _forward(self, params, batch_stats, ir: jnp.ndarray) -> jnp.ndarray:
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return self.module.apply(variables, ir, train=False)

    def __call__(self, ir: jnp.ndarray) -> jnp.ndarray:
        """IR (B,H,W,1) in [-1,1] → RGB (B,H,W,3) in [-1,1] (ref :791-796)."""
        return self._forward(self.params, self.batch_stats, ir)

"""VGG-16 perceptual feature tower (through relu3_3).

Reference semantics: ``VGGPerceptual``
(`/root/reference/Code/ir_colorization.py:642-683`) — frozen torchvision
VGG-16 (IMAGENET1K_V1) ``features[:16]``: conv1_1..conv3_3 with ReLUs and two
2×2 max-pools, i.e. conv channel plan [64, 64, M, 128, 128, M, 256, 256, 256]
ending at relu3_3. Inputs are [-1,1] images mapped to [0,1] then
ImageNet-normalized (mean [0.485,0.456,0.406], std [0.229,0.224,0.225],
ref :672-682).

torchvision is unavailable in this environment, so pretrained weights must be
imported from a torchvision ``vgg16`` state_dict ``.pth`` via
``ircolor_tpu.compat.torch_import.load_vgg16_pth``. Without one,
``init_vgg16_params`` provides a deterministic lecun-normal init (flax's
Conv default, variance 1/fan_in) — training
still runs, but the perceptual term is then NOT ImageNet-pretrained (random
VGG features still carry useful structure, but loss parity requires the
pretrained weights; documented in README).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# (name, out_channels); "pool" entries are 2×2 stride-2 max pools.
# Matches torchvision vgg16.features indices 0..15 (convs at 0,2,5,7,10,12,14).
VGG16_PLAN: tuple[tuple[str, int | None], ...] = (
    ("conv1_1", 64),
    ("conv1_2", 64),
    ("pool1", None),
    ("conv2_1", 128),
    ("conv2_2", 128),
    ("pool2", None),
    ("conv3_1", 256),
    ("conv3_2", 256),
    ("conv3_3", 256),
)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _lanepack_same_conv(features: int, p: int, dtype, precision, name: str):
    """3×3 SAME lane-packed conv with nn.Conv-matching init (lecun/zeros):
    the RNG path is ``params/<name>/kernel``, identical to the plain
    tower's, so the random fallback init and imported torchvision weights
    are interchangeable between packed and unpacked towers."""
    from ircolor_tpu.models.common import LanePackConv

    return LanePackConv(
        features=features, ksize=3, padding="SAME", p=p, dtype=dtype,
        precision=precision, kernel_init=nn.initializers.lecun_normal(),
        bias_init=nn.initializers.zeros_init(), name=name,
    )


class VGG16Features(nn.Module):
    """Frozen VGG-16 features[:16]; input NHWC in [-1,1]; output relu3_3.

    ``lanepack_p > 1`` computes the Cout=64 convs (conv1_1/conv1_2 — 50% MXU
    lane fill at full resolution) lane-packed with ``p`` output pixels in the
    feature dim; applied only where ``Cout·p ≤ 128`` and W divides p. Param
    trees are identical either way."""

    dtype: Any = jnp.float32
    precision: Any = None
    lanepack_p: int = 1
    # Scatter-free max-pool backward (ops/pooling.py): exact in fwd AND bwd
    # (first-max tie routing matches XLA SelectAndScatter and torch), the
    # VJP is elementwise compares instead of a window-serial
    # SelectAndScatter. MEASURED NULL in-context: the fast pool costs
    # +11.7 ms/step at b8 512×640 (255.1 with it vs 243.4 with nn.max_pool,
    # same process) — XLA's fused SelectAndScatter beats the comparison
    # cascade's extra full-plane reads inside the step graph. Kept
    # parity-tested + opt-in for A/Bs (`tools/trainbench.py --variants
    # ship,vgg_fast_pool`; docs/PERF.md round-3 session 3).
    fast_pool: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ircolor_tpu.ops.pooling import max_pool_2x2

        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        h = (x + 1.0) / 2.0                 # [-1,1] → [0,1] (ref :679)
        h = (h - mean) / std                # ImageNet normalize (ref :681-682)
        for name, ch in VGG16_PLAN:
            if ch is None:
                if self.fast_pool:
                    h = max_pool_2x2(h)
                else:
                    h = nn.max_pool(h, (2, 2), strides=(2, 2))
            else:
                p = self.lanepack_p
                if p > 1 and ch * p <= 128 and h.shape[2] % p == 0:
                    h = _lanepack_same_conv(
                        ch, p, self.dtype, self.precision, name
                    )(h)
                else:
                    h = nn.Conv(
                        ch,
                        (3, 3),
                        padding=((1, 1), (1, 1)),
                        use_bias=True,
                        dtype=self.dtype,
                        precision=self.precision,
                        name=name,
                    )(h)
                h = nn.relu(h)
        return h


def init_vgg16_params(seed: int = 0) -> Any:
    """Deterministic fallback init when no .pth is supplied (flax Conv
    default: lecun_normal, variance 1/fan_in — NOT He/2·fan_in)."""
    module = VGG16Features()
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return module.init(jax.random.PRNGKey(seed), dummy)["params"]


def load_vgg16_params(path: str | None, seed: int = 0) -> Any:
    """Load pretrained VGG-16 params from a torchvision .pth, else fallback."""
    if path is None:
        return init_vgg16_params(seed)
    from ircolor_tpu.compat.torch_import import load_vgg16_pth

    return load_vgg16_pth(path)

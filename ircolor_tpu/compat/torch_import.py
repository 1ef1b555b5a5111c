"""PyTorch ``.pth`` state_dict ↔ Flax param tree converters.

The reference checkpoints (`.MISSING_LARGE_BLOBS` lists 33 of them across 3
training regimes) are flat PyTorch state_dicts of ``netG`` saved at
`/root/reference/Code/ir_colorization.py:1708, 1714` and loaded permissively
at ref :781-789 (``{'state_dict': ...}`` unwrap + ``strict=False``).

Name mapping (reference module → our Flax param path):

  inc.1                      → inc_conv
  down1.0 / down2.0          → down1_conv / down2_conv
  resblocks.{i}.conv_block.* → resblock_{i}/conv1, resblock_{i}/conv2
                               (the two 4-D conv weights per block, in index
                               order — robust to reflect/zero/dropout layouts)
  up1_conv.0 / up2_conv.0    → up1_conv / up2_conv
  up1_up / up2_up            → up1_up / up2_up   (ConvTranspose variant only)
  outc.1                     → outc_conv
  *_down.filt, *_up.filt     → dropped (fixed blur buffers, rebuilt here)

Discriminator (``model.{0,2,5,8,11}`` for n_layers=3, ref :599-632) maps in
ascending index order to conv0..conv{n_layers}, conv_out.

Weight layout: torch Conv2d OIHW → Flax HWIO via transpose (2,3,1,0); torch
ConvTranspose2d (I,O,kh,kw) → (kh,kw,O,I)→flax ConvTranspose HWIO transpose
(2,3,1,0). InstanceNorm2d has no params (PyTorch default affine=False), so
conv weights+biases are the complete state.

torch is used only to deserialize the pickle; everything device-side is JAX.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _to_numpy(t: Any) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _load_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]  # permissive unwrap (ref :787-788)
    return {k: _to_numpy(v) for k, v in state.items()}


def _conv(kernel_oihw: np.ndarray, bias: np.ndarray | None) -> dict[str, np.ndarray]:
    out = {"kernel": np.transpose(kernel_oihw, (2, 3, 1, 0)).astype(np.float32)}
    if bias is not None:
        out["bias"] = bias.astype(np.float32)
    return out


def load_generator_pth(path: str) -> dict[str, Any]:
    """torchvision-free import of a reference netG checkpoint."""
    sd = _load_state_dict(path)
    params: dict[str, Any] = {}

    direct = {
        "inc.1": "inc_conv",
        "down1.0": "down1_conv",
        "down2.0": "down2_conv",
        "up1_conv.0": "up1_conv",
        "up2_conv.0": "up2_conv",
        "outc.1": "outc_conv",
    }
    for src, dst in direct.items():
        w = sd.get(f"{src}.weight")
        if w is not None:
            params[dst] = _conv(w, sd.get(f"{src}.bias"))

    # ConvTranspose upsamplers (no_antialias_up variant, ref :495-499).
    for src in ("up1_up", "up2_up"):
        w = sd.get(f"{src}.weight")
        if w is not None and w.ndim == 4:
            # torch ConvTranspose2d weight (in, out, kh, kw) → (kh, kw, out, in):
            # our ConvTranspose uses transpose_kernel=True (grad-of-conv), whose
            # kernel layout swaps I/O relative to a forward conv.
            kernel = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
            entry: dict[str, np.ndarray] = {"kernel": kernel}
            b = sd.get(f"{src}.bias")
            if b is not None:
                entry["bias"] = b.astype(np.float32)
            params[src] = entry

    # ResNet blocks: pick the two 4-D conv weights per block in index order.
    block_convs: dict[int, list[tuple[int, str]]] = {}
    pat = re.compile(r"^resblocks\.(\d+)\.conv_block\.(\d+)\.weight$")
    for key, val in sd.items():
        m = pat.match(key)
        if m and val.ndim == 4:
            block_convs.setdefault(int(m.group(1)), []).append((int(m.group(2)), key))
    for i, convs in block_convs.items():
        convs.sort()
        names = ["conv1", "conv2"]
        entry: dict[str, Any] = {}
        for (idx, wkey), name in zip(convs, names):
            bias = sd.get(wkey[: -len("weight")] + "bias")
            entry[name] = _conv(sd[wkey], bias)
        params[f"resblock_{i}"] = entry

    return params


def load_discriminator_pth(path: str) -> dict[str, Any]:
    """Import a PatchGAN ``netD`` state_dict (``model.{idx}`` sequential)."""
    sd = _load_state_dict(path)
    conv_idxs = sorted(
        int(m.group(1))
        for k, v in sd.items()
        if (m := re.match(r"^model\.(\d+)\.weight$", k)) and v.ndim == 4
    )
    params: dict[str, Any] = {}
    for pos, idx in enumerate(conv_idxs):
        if pos == len(conv_idxs) - 1:
            name = "conv_out"
        else:
            name = f"conv{pos}"
        params[name] = _conv(sd[f"model.{idx}.weight"], sd.get(f"model.{idx}.bias"))
    return params


def load_vgg16_pth(path: str) -> dict[str, Any]:
    """Import torchvision vgg16 ``features`` weights (first 7 convs)."""
    from ircolor_tpu.losses.vgg import VGG16_PLAN

    sd = _load_state_dict(path)
    conv_names = [name for name, ch in VGG16_PLAN if ch is not None]
    conv_idxs = sorted(
        int(m.group(1))
        for k, v in sd.items()
        if (m := re.match(r"^features\.(\d+)\.weight$", k)) and v.ndim == 4
    )
    params: dict[str, Any] = {}
    for name, idx in zip(conv_names, conv_idxs):
        params[name] = _conv(sd[f"features.{idx}.weight"], sd.get(f"features.{idx}.bias"))
    return params


def export_generator_pth(
    params: Mapping[str, Any],
    path: str,
    *,
    no_antialias: bool = False,
    pad_type: str = "reflect",
    use_dropout: bool = False,
) -> None:
    """Export our generator params as a reference-compatible netG .pth.

    ``pad_type``/``use_dropout`` select the resblock ``conv_block`` indices
    the reference's Sequential layout puts the two convs at (ref
    build_conv_block :375-414: pad modules only exist for reflect/replicate,
    dropout inserts one module after the first ReLU). The reference loads
    with ``strict=False`` (ref :781-789), so WRONG indices would be silently
    dropped there — the variant must be declared, not guessed.

    Produces the flat state_dict layout the reference saves/loads
    (ref :1708, :781-789) including the fixed blur-filter buffers so
    ``load_state_dict(strict=False)`` round-trips cleanly. The
    ``no_antialias_up`` variant is detected from the params themselves
    (``up1_up``/``up2_up`` ConvTranspose kernels present): their learned
    weights are exported (a netG trained that way must not silently load
    with random upsamplers on the reference side) and the up-path blur
    buffers are omitted. Pass ``no_antialias=True`` for generators built
    with stride-2 down convs so the down-path blur buffers are omitted too.
    """
    import torch

    from ircolor_tpu.ops.filters import binomial_filter_2d

    def t(kernel_hwio: np.ndarray) -> "torch.Tensor":
        return torch.from_numpy(np.transpose(np.asarray(kernel_hwio), (3, 2, 0, 1)).copy())

    sd: dict[str, Any] = {}
    direct = {
        "inc_conv": "inc.1",
        "down1_conv": "down1.0",
        "down2_conv": "down2.0",
        "up1_conv": "up1_conv.0",
        "up2_conv": "up2_conv.0",
        "outc_conv": "outc.1",
    }
    for src, dst in direct.items():
        if src in params:
            sd[f"{dst}.weight"] = t(params[src]["kernel"])
            if "bias" in params[src]:
                sd[f"{dst}.bias"] = torch.from_numpy(np.asarray(params[src]["bias"]).copy())

    # conv_block Sequential indices (ref :375-414): a pad module precedes
    # each conv for reflect/replicate (zero pads inside the conv), dropout
    # adds one module after the first ReLU.
    padded = pad_type in ("reflect", "replicate")
    conv1_idx = 1 if padded else 0
    conv2_idx = conv1_idx + 3 + int(bool(use_dropout)) + int(padded)
    for key in sorted(k for k in params if k.startswith("resblock_")):
        i = int(key.split("_")[1])
        for name, idx in (("conv1", conv1_idx), ("conv2", conv2_idx)):
            entry = params[key][name]
            sd[f"resblocks.{i}.conv_block.{idx}.weight"] = t(entry["kernel"])
            if "bias" in entry:
                sd[f"resblocks.{i}.conv_block.{idx}.bias"] = torch.from_numpy(
                    np.asarray(entry["bias"]).copy()
                )

    # ConvTranspose upsamplers (no_antialias_up variant): export the learned
    # kernels under the reference's ``up{1,2}_up.weight/.bias`` names.
    # (kh, kw, out, in) → torch ConvTranspose2d (in, out, kh, kw); inverse of
    # the import transpose above.
    transpose_up = False
    for name in ("up1_up", "up2_up"):
        entry = params.get(name)
        if entry is not None and "kernel" in entry:
            transpose_up = True
            kernel = np.asarray(entry["kernel"])
            sd[f"{name}.weight"] = torch.from_numpy(
                np.transpose(kernel, (3, 2, 0, 1)).copy()
            )
            if "bias" in entry:
                sd[f"{name}.bias"] = torch.from_numpy(np.asarray(entry["bias"]).copy())

    # Fixed blur buffers (ref registers them; rebuilt, not learned). Only the
    # modules the matching reference variant actually instantiates; channel
    # counts follow the conv that feeds each blur (ngf-agnostic).
    filt = torch.from_numpy(binomial_filter_2d(3))

    def out_ch(name: str) -> int:
        return int(np.asarray(params[name]["kernel"]).shape[-1])

    blur_modules: list[tuple[str, int]] = []
    if not no_antialias:
        blur_modules += [
            ("down1_down", out_ch("down1_conv")),
            ("down2_down", out_ch("down2_conv")),
        ]
    if not transpose_up:
        blur_modules += [
            ("up1_up", out_ch("down2_conv")),  # blurs the bottleneck output
            ("up2_up", out_ch("up1_conv")),
        ]
    for name, ch in blur_modules:
        sd[f"{name}.filt"] = filt[None, None].repeat(ch, 1, 1, 1)

    torch.save(sd, path)

"""Image I/O and normalization round-trips.

Reference semantics (`/root/reference/Code/ir_colorization.py:803-885`):

* ``load_ir_image`` (ref :803-830): cv2 grayscale read, INTER_AREA resize,
  float32 [0,1] with 8-bit (÷255) vs 16-bit (÷65535) handling keyed on the
  ORIGINAL dtype (the division only fires when max > 1.0), clip.
* ``load_rgb_image`` (ref :833-852): cv2 color read, BGR→RGB, INTER_AREA
  resize, ÷255, clip.
* ``ir_to_tensor`` (ref :855-862): [0,1] H×W → [-1,1]; here NHWC (H,W,1).
* ``tensor_to_rgb_image`` (ref :865-876): [-1,1] → uint8 via (x+1)/2, clip,
  ×255 truncation (numpy astype semantics).
* ``float01_to_uint8_rgb`` (ref :945-958), ``save_rgb`` (ref :879-885).

cv2 decode/resize stays on host (INTER_AREA parity, SURVEY.md §7.3); sizes
are (H, W)-capable — the reference assumes square ``img_size`` (ref :818).
"""

from __future__ import annotations

import os

import cv2
import numpy as np
from PIL import Image


def _resize(img: np.ndarray, size_hw: tuple[int, int] | int | None) -> np.ndarray:
    if size_hw is None:
        return img
    if isinstance(size_hw, int):
        size_hw = (size_hw, size_hw)
    h, w = size_hw
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)


def load_ir_image(
    path: str,
    size_hw: tuple[int, int] | int | None = None,
    *,
    return_depth: bool = False,
):
    """Grayscale IR image → H×W float32 in [0,1] (ref :803-830).

    With ``return_depth=True`` also returns the source bit depth (8 or 16),
    so callers can pick the narrowest exact integer transport encoding.

    NOTE on the 16-bit branch: ``IMREAD_GRAYSCALE`` (the reference's flag,
    ref :812) downconverts 16-bit sources to uint8 at decode, so
    ``orig_dtype`` is uint8 and the /65535 branch never fires — in the
    reference EITHER (its ref :823-828 branch reads the dtype of the same
    already-converted result). The branch is kept as defensive parity with
    the reference's code, and the int-transport/raw paths treat every
    decoded frame as the 8-bit data it actually is."""
    img_u = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img_u is None:
        raise RuntimeError(f"Could not read image: {path}")
    orig_dtype = img_u.dtype
    img_u = _resize(img_u, size_hw)
    img = img_u.astype(np.float32)
    if img.max() > 1.0:
        img /= 255.0 if orig_dtype == np.uint8 else 65535.0
    img = np.clip(img, 0.0, 1.0)
    if return_depth:
        return img, (8 if orig_dtype == np.uint8 else 16)
    return img


def load_rgb_image(path: str, size_hw: tuple[int, int] | int | None = None) -> np.ndarray:
    """Color image → H×W×3 float32 RGB in [0,1] (ref :833-852)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise RuntimeError(f"Could not read RGB image: {path}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    img = _resize(img, size_hw)
    img = img.astype(np.float32) / 255.0
    return np.clip(img, 0.0, 1.0)


def ir_to_array(img_hw: np.ndarray) -> np.ndarray:
    """[0,1] H×W → [-1,1] float32 (1,H,W,1) NHWC (ref ir_to_tensor :855-862)."""
    return (img_hw[None, :, :, None] * 2.0 - 1.0).astype(np.float32)


def array_to_rgb_image(batch_nhwc: np.ndarray, index: int = 0) -> np.ndarray:
    """[-1,1] NHWC batch → one H×W×3 uint8 image (ref :865-876)."""
    x = np.asarray(batch_nhwc[index], dtype=np.float32)
    x = (x + 1.0) / 2.0
    x = np.clip(x, 0.0, 1.0)
    return (x * 255.0).astype(np.uint8)


def float01_to_uint8_rgb(img01: np.ndarray) -> np.ndarray:
    """float [0,1] gray or RGB → uint8 H×W×3, gray replicated (ref :945-958)."""
    x = np.clip(img01, 0.0, 1.0)
    if x.ndim == 2:
        x = np.stack([x, x, x], axis=2)
    return (x * 255.0).astype(np.uint8)


def save_rgb(path: str, img_rgb_u8: np.ndarray) -> None:
    """Image save with parent-dir creation (ref save_rgb :879-885).

    Writes via cv2 with fast PNG compression (level 1) — PIL's default
    zlib level 6 dominated end-to-end wall time at 512×640; the artifact is
    the same lossless PNG (or JPEG etc. by extension).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    bgr = cv2.cvtColor(np.ascontiguousarray(img_rgb_u8), cv2.COLOR_RGB2BGR)
    try:
        ok = cv2.imwrite(path, bgr, [cv2.IMWRITE_PNG_COMPRESSION, 1])
    except cv2.error:
        ok = False  # cv2 RAISES on unknown extensions (it does not return False)
    if not ok:
        Image.fromarray(img_rgb_u8).save(path)  # PIL fallback keeps behavior

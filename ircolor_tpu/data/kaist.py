"""KAIST dataset discovery, pairing and splits.

Reference semantics:

* ``collect_kaist_ir_files_from_sets``
  (`/root/reference/Code/ir_colorization.py:887-942`): recursive ``os.walk``
  for directories literally named ``lwir`` (case-insensitive) with a sibling
  ``visible`` directory; yields sorted ``(ir_path, set_name, seq_rel)`` with
  ``seq_rel = relpath(seq_dir, root)`` (supports arbitrary nesting); image
  extensions {png,jpg,jpeg,bmp,tif,tiff}; warns on missing roots.
* ``KAISTPairDataset`` (ref :1045-1177): pairs by FILENAME INTERSECTION of
  each sequence's lwir/ and visible/ dirs; raises when no pairs exist;
  optional index subset for train/val; paired random horizontal flip p=0.5
  when augmenting.
* The seed-42 split (ref :1558-1568): ``random.seed(42)``, shuffle indices,
  ``val_size = max(1, int(N·val_ratio))``, first N−val are train.
  Reproduced bit-exactly (same ``random.Random(42).shuffle``) so a run here
  trains on the same frames as the reference. Unlike the reference (which
  rescans the directory tree 3×, ref :1555-1573), scanning happens once.

Decoding returns NHWC numpy; device transfer happens in the pipeline.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import Iterable, Sequence

import numpy as np

from ircolor_tpu.data.io import load_ir_image, load_rgb_image
from ircolor_tpu.utils.logging import get_logger

log = get_logger(__name__)

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def _list_imgs(folder: str) -> list[str]:
    if not os.path.isdir(folder):
        return []
    return sorted(
        os.path.join(folder, fn)
        for fn in os.listdir(folder)
        if fn.lower().endswith(IMAGE_EXTS)
    )


def _walk_lwir_dirs(root: str) -> Iterable[tuple[str, str]]:
    """Yield (lwir_dir, visible_dir) for every paired sequence under root."""
    for dirpath, _dirnames, _filenames in os.walk(root):
        if os.path.basename(dirpath).lower() != "lwir":
            continue
        seq_dir = os.path.dirname(dirpath)
        vis_dir = os.path.join(seq_dir, "visible")
        if os.path.isdir(vis_dir):
            yield dirpath, vis_dir


def collect_kaist_ir_files_from_sets(
    set_roots: str | Sequence[str],
) -> list[tuple[str, str, str]]:
    """All IR frames under ``lwir`` dirs with a ``visible`` sibling
    (ref :887-942). Returns (ir_path, set_name, seq_rel) tuples."""
    if isinstance(set_roots, (str, bytes)):
        set_roots = [set_roots]
    entries: list[tuple[str, str, str]] = []
    for root in set_roots:
        if not os.path.isdir(root):
            log.warning("[WARN] set root not found: %s", root)
            continue
        set_name = os.path.basename(root.rstrip("\\/"))
        for lwir_dir, _vis_dir in _walk_lwir_dirs(root):
            ir_files = _list_imgs(lwir_dir)
            if not ir_files:
                continue
            seq_rel = os.path.relpath(os.path.dirname(lwir_dir), root)
            entries.extend((p, set_name, seq_rel) for p in ir_files)
    return entries


def scan_kaist_pairs(roots: str | Sequence[str]) -> tuple[list[str], list[str]]:
    """Filename-intersection pairing across all sequences (ref :1086-1114)."""
    if isinstance(roots, (str, bytes)):
        roots = [roots]
    all_ir: list[str] = []
    all_rgb: list[str] = []
    for root in roots:
        if not os.path.isdir(root):
            continue
        for lwir_dir, vis_dir in _walk_lwir_dirs(root):
            ir_map = {os.path.basename(p): p for p in _list_imgs(lwir_dir)}
            rgb_map = {os.path.basename(p): p for p in _list_imgs(vis_dir)}
            for fn in sorted(set(ir_map) & set(rgb_map)):
                all_ir.append(ir_map[fn])
                all_rgb.append(rgb_map[fn])
    return all_ir, all_rgb


def split_train_val(n: int, val_ratio: float, seed: int = 42) -> tuple[list[int], list[int]]:
    """The reference's reproducible split (ref :1558-1568)."""
    val_size = max(1, int(n * val_ratio))
    train_size = n - val_size
    idxs = list(range(n))
    random.Random(seed).shuffle(idxs)
    return idxs[:train_size], idxs[train_size:]


@dataclass
class KAISTPairDataset:
    """Paired IR/RGB dataset (ref :1045-1177), NHWC numpy samples.

    ``__getitem__`` returns ``{'ir': (H,W,1), 'rgb': (H,W,3)}`` float32 in
    [-1,1]. Augmentation (paired horizontal flip p=0.5) is derived
    deterministically from ``(seed, epoch, index)`` — no shared mutable RNG
    stream, so results are identical regardless of decode-thread scheduling
    (the reference uses the global ``random`` state inside DataLoader
    workers, which is neither reproducible nor thread-safe).
    """

    ir_paths: list[str]
    rgb_paths: list[str]
    size_hw: tuple[int, int] = (256, 256)
    augment: bool = True
    seed: int = 0

    def __post_init__(self) -> None:
        if len(self.ir_paths) != len(self.rgb_paths):
            raise ValueError("ir/rgb path lists must have equal length")
        self._epoch = 0
        log.info(
            "[KAISTPairDataset] total pairs: %d (augment=%s)",
            len(self.ir_paths),
            self.augment,
        )

    def set_epoch(self, epoch: int) -> None:
        """Advance the augmentation stream (flips differ across epochs)."""
        self._epoch = epoch

    def _flip(self, idx: int) -> bool:
        if not self.augment:
            return False
        return random.Random(f"{self.seed}:{self._epoch}:{idx}").random() < 0.5

    @classmethod
    def from_roots(
        cls,
        roots: str | Sequence[str],
        size_hw: tuple[int, int] | int = (256, 256),
        augment: bool = True,
        indices: Sequence[int] | None = None,
        seed: int = 0,
    ) -> "KAISTPairDataset":
        if isinstance(size_hw, int):
            size_hw = (size_hw, size_hw)
        all_ir, all_rgb = scan_kaist_pairs(roots)
        if not all_ir:
            # A bare-string root must print as the path, not a char list.
            shown = [roots] if isinstance(roots, str) else list(roots)
            raise RuntimeError(f"No IR-RGB pairs found under roots: {shown}")
        if indices is not None:
            all_ir = [all_ir[i] for i in indices]
            all_rgb = [all_rgb[i] for i in indices]
        return cls(all_ir, all_rgb, size_hw, augment, seed)

    def __len__(self) -> int:
        return len(self.ir_paths)

    def _read_pair(self, idx: int):
        """Shared decode for the fast paths: resized IR (native dtype, as
        ``load_ir_image`` reads it) + resized uint8 RGB (BGR→RGB)."""
        import cv2

        ir_u = cv2.imread(self.ir_paths[idx], cv2.IMREAD_GRAYSCALE)
        if ir_u is None:
            raise RuntimeError(f"Could not read IR image: {self.ir_paths[idx]}")
        rgb_u = cv2.imread(self.rgb_paths[idx], cv2.IMREAD_COLOR)
        if rgb_u is None:
            raise RuntimeError(f"Could not read RGB image: {self.rgb_paths[idx]}")
        h, w = self.size_hw
        ir_u = cv2.resize(ir_u, (w, h), interpolation=cv2.INTER_AREA)
        rgb_u = cv2.cvtColor(rgb_u, cv2.COLOR_BGR2RGB)
        rgb_u = cv2.resize(rgb_u, (w, h), interpolation=cv2.INTER_AREA)
        return ir_u, rgb_u

    def raw_item(self, idx: int):
        """Fast path for the native batch assembler: resized uint8 images +
        a deferred flip flag (normalize/flip/stack happen in C++,
        ``ircolor_tpu.data.native``). Returns None — falling back to the
        exact float path — for non-8-bit sources AND for frames hit by the
        reference's max≤1 no-normalize quirk (ref :822-827: an IR image
        whose values are all 0/1 skips the ÷255, mapping 1 → +1.0; the C++
        kernel always divides, which would map it to −0.992).
        """
        ir_u, rgb_u = self._read_pair(idx)
        if ir_u.dtype != np.uint8 or ir_u.max() <= 1:
            return None
        return ir_u[:, :, None], rgb_u, self._flip(idx)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        ir = load_ir_image(self.ir_paths[idx], self.size_hw)
        rgb = load_rgb_image(self.rgb_paths[idx], self.size_hw)
        if self._flip(idx):
            ir = np.fliplr(ir).copy()
            rgb = np.fliplr(rgb).copy()
        return {
            "ir": (ir[:, :, None] * 2.0 - 1.0).astype(np.float32),
            "rgb": (rgb * 2.0 - 1.0).astype(np.float32),
        }

    def int_item(self, idx: int) -> dict[str, np.ndarray]:
        """Integer-transport sample: ``{'ir': uint16 HW1, 'rgb': uint8 HWC}``
        with the flip applied — 1/3 the host→device bytes of the float form.

        Encodes the EXACT values ``__getitem__`` would produce (the jitted
        step decodes, train/step.py:_decode_transport): 8-bit IR value k →
        257·k (k/255 == 257k/65535 as rationals); 16-bit IR value m → m
        (÷65535 on device, matching load_ir_image's 16-bit branch); the
        reference's max≤1 no-normalize quirk (ref :822-827: images whose
        values are all 0/1 skip the divide) → k·65535; RGB value k → k
        (÷255 on device).
        """
        ir_u, rgb_u = self._read_pair(idx)
        if ir_u.max() <= 1:          # ref :822-827 quirk: divide skipped
            scale = 65535
        elif ir_u.dtype == np.uint8:
            scale = 257              # k/255 == 257k/65535 exactly
        else:
            scale = 1                # 16-bit source: raw value, ÷65535
        ir16 = ir_u.astype(np.uint16) * np.uint16(scale)
        if self._flip(idx):
            ir16 = np.fliplr(ir16)
            rgb_u = np.fliplr(rgb_u)
        return {
            "ir": np.ascontiguousarray(ir16[:, :, None]),
            "rgb": np.ascontiguousarray(rgb_u),
        }

"""ctypes bindings for the native batch-assembly kernels.

Builds ``native/batchops.cpp`` on first use (g++, cached next to the
source), loads it with ctypes, and exposes ``assemble_batch`` — a
multithreaded fused uint8→float32 normalize([-1,1]) + horizontal-flip +
stack directly into the NHWC batch buffer. Falls back transparently to the
numpy path when a compiler is unavailable (``available()`` gates callers).

This is the TPU-native analogue of the reference's DataLoader-worker
collate: decode stays in cv2 (native), and the per-sample normalize/stack —
GIL-serialized in pure numpy — moves into C++ threads.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Sequence

import numpy as np

from ircolor_tpu.utils.logging import get_logger

log = get_logger(__name__)

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native", "batchops.cpp")


def _build_and_load() -> ctypes.CDLL | None:
    src = os.path.abspath(_source_path())
    if not os.path.isfile(src):
        return None
    out = os.path.join(os.path.dirname(src), "libbatchops.so")
    if not os.path.isfile(out) or os.path.getmtime(out) < os.path.getmtime(src):
        # Build to a per-PID temp name and rename atomically: two processes
        # hitting a missing/stale .so concurrently (parallel pytest, train +
        # eval) must never dlopen a half-written file. os.replace is atomic
        # on POSIX; the loser's rename simply wins last with identical bits.
        tmp = f"{out}.{os.getpid()}.tmp"
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, src, "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, out)
        except (subprocess.CalledProcessError, FileNotFoundError, OSError) as exc:
            log.warning("native batchops build failed (%s); using numpy path", exc)
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    lib = ctypes.CDLL(out)
    lib.assemble_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.u8_to_f32_affine.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_int,
    ]
    return lib


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            _lib = _build_and_load()
    return _lib


def available() -> bool:
    return get_lib() is not None


def assemble_batch(
    images_u8: Sequence[np.ndarray],
    flips: Sequence[bool] | None = None,
    out: np.ndarray | None = None,
    nthreads: int = 4,
) -> np.ndarray:
    """Fused u8→f32 [-1,1] normalize + flip + stack → (B,H,W,C) float32.

    All images must share one HxW[xC] uint8 shape and be C-contiguous.
    """
    lib = get_lib()
    b = len(images_u8)
    first = images_u8[0]
    h, w = first.shape[:2]
    c = first.shape[2] if first.ndim == 3 else 1
    if flips is None:
        flips = [False] * b

    if lib is None:  # numpy fallback, same semantics
        res = out if out is not None else np.empty((b, h, w, c), np.float32)
        for i, img in enumerate(images_u8):
            arr = img[:, ::-1] if flips[i] else img
            res[i] = (arr.reshape(h, w, c).astype(np.float32) / 255.0) * 2.0 - 1.0
        return res

    if out is None:
        out = np.empty((b, h, w, c), np.float32)
    elif (
        out.shape != (b, h, w, c)
        or out.dtype != np.float32
        or not out.flags["C_CONTIGUOUS"]
    ):
        # The C++ kernel writes through a raw pointer — a wrong-shape/dtype
        # or strided `out` would be silent memory corruption, not an error.
        raise ValueError(
            f"assemble_batch out must be C-contiguous float32 {(b, h, w, c)}, "
            f"got {out.dtype} {out.shape}"
        )
    expect = first.shape
    ptrs = (ctypes.c_void_p * b)()
    keepalive = []
    for i, img in enumerate(images_u8):
        if img.dtype != np.uint8:
            raise TypeError("assemble_batch requires uint8 images")
        if img.shape != expect:
            # The kernel strides every source by h·w·c — a mismatched image
            # would be read out of bounds (the numpy path raises on reshape;
            # keep both paths failing loudly and identically).
            raise ValueError(
                f"assemble_batch image {i} has shape {img.shape}, expected "
                f"{expect} (all images must match the first)"
            )
        img = np.ascontiguousarray(img)
        keepalive.append(img)
        ptrs[i] = img.ctypes.data
    flip_bytes = bytes(1 if f else 0 for f in flips)
    lib.assemble_batch_u8(
        ptrs,
        flip_bytes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, h, w, c, nthreads,
    )
    return out

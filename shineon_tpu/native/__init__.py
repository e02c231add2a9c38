"""Native host-staging library: build-on-first-use + ctypes bindings.

See staging.cpp for what it does. Compiled with the system g++ at first
import (cached next to the source); every entry point has a pure-numpy
fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

from shineon_tpu.utils.log import get_logger

logger = get_logger()

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "staging.cpp")
_SO = osp.join(_HERE, "_staging.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    with _lock:
        if osp.exists(_SO) and osp.getmtime(_SO) >= osp.getmtime(_SRC):
            return ctypes.CDLL(_SO)
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC, "-o", _SO, "-lpng", "-ljpeg"],
                check=True, capture_output=True, timeout=120,
            )
            return ctypes.CDLL(_SO)
        except Exception as exc:  # pragma: no cover - toolchain-less envs
            logger.warning(f"native staging build failed ({exc}); numpy fallback")
            _build_failed = True
            return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        lib = _build()
        if lib is not None:
            lib.read_flo_batch.restype = ctypes.c_int
            lib.read_flo_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ]
            lib.center_crop_u8_batch.restype = ctypes.c_int
            lib.center_crop_u8_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.decode_image_batch.restype = ctypes.c_int
            lib.decode_image_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ]
        _lib = lib
    return _lib


def decode_image_batch(
    paths: List[str], out_h: int, out_w: int, channels: int = 3,
    n_threads: int = 4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode + center-crop a batch of PNG/JPEG files without the GIL.

    channels=3 -> RGB (PIL convert("RGB") semantics); channels=1 -> raw 8-bit
    label values (palette indices for colormapped PNGs, the LIP parse maps).
    Returns (images (n, out_h, out_w, channels) u8, valid (n,) float32);
    failed slots are zeroed with valid=0.
    """
    n = len(paths)
    out = np.zeros((n, out_h, out_w, channels), np.uint8)
    valid = np.zeros((n,), np.int32)
    lib = get_lib()
    if lib is not None and n > 0:
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.decode_image_batch(
            c_paths, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out_h, out_w, channels,
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_threads,
        )
        return out, valid.astype(np.float32)

    # PIL fallback
    from PIL import Image

    for i, path in enumerate(paths):
        try:
            img = Image.open(path)
            if channels == 3:
                img = img.convert("RGB")
            arr = np.asarray(img, np.uint8)
            if channels == 1 and arr.ndim == 3:
                arr = arr[..., 0]
            h, w = arr.shape[:2]
            y0, x0 = (h - out_h) // 2, (w - out_w) // 2
            sy, dy = max(y0, 0), max(-y0, 0)
            sx, dx = max(x0, 0), max(-x0, 0)
            ch = min(out_h - dy, h - sy)
            cw = min(out_w - dx, w - sx)
            view = arr[sy:sy + ch, sx:sx + cw]
            out[i, dy:dy + ch, dx:dx + cw] = (
                view[..., None] if channels == 1 else view
            )
            valid[i] = 1
        except (FileNotFoundError, OSError, ValueError, TypeError):
            pass
    return out, valid.astype(np.float32)


def read_flo_batch(
    paths: List[str], out_h: int, out_w: int, n_threads: int = 4
) -> Tuple[np.ndarray, np.ndarray]:
    """Read + center-crop a batch of .flo files.

    Returns (flow (n, out_h, out_w, 2) float32, valid (n,) float32) with the
    reference's zeros fallback for missing files.
    """
    n = len(paths)
    out = np.zeros((n, out_h, out_w, 2), np.float32)
    valid = np.zeros((n,), np.int32)
    lib = get_lib()
    if lib is not None and n > 0:
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths]
        )
        lib.read_flo_batch(
            c_paths, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h, out_w,
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_threads,
        )
        return out, valid.astype(np.float32)

    # numpy fallback
    from shineon_tpu.datasets.flow_utils import read_flow

    for i, path in enumerate(paths):
        try:
            flow = read_flow(path)
            h, w = flow.shape[:2]
            y0, x0 = (h - out_h) // 2, (w - out_w) // 2
            sy, dy = max(y0, 0), max(-y0, 0)
            sx, dx = max(x0, 0), max(-x0, 0)
            ch = min(out_h - dy, h - sy)
            cw = min(out_w - dx, w - sx)
            out[i, dy:dy + ch, dx:dx + cw] = flow[sy:sy + ch, sx:sx + cw]
            valid[i] = 1
        except (FileNotFoundError, ValueError, TypeError):
            pass
    return out, valid.astype(np.float32)

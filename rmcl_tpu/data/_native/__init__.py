"""Native (C++) input-pipeline kernels, loaded via ctypes.

`load_wordpiece()` compiles wordpiece.cpp with g++ on first use (cached
.so next to the source) and returns the bound library, or None when no
toolchain is available — callers fall back to the Python path.

The cached .so is keyed to a content hash of its source (sidecar
`<so>.srchash`): a stale or foreign binary is never loaded — everything
executed here is compiled from the reviewed .cpp in this tree (.so files
are gitignored, never committed).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "wordpiece.cpp")
_SO = os.path.join(_DIR, "_wordpiece.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _compile_cached(src: str, so: str, opt: str) -> str:
    """Compile `src` -> `so` unless an .so built from EXACTLY this source
    (sha256 recorded in `<so>.srchash`) is already present."""
    with open(src, "rb") as f:
        want = hashlib.sha256(f.read()).hexdigest()
    stamp = so + ".srchash"
    try:
        with open(stamp) as f:
            have = f.read().strip()
    except OSError:
        have = None
    if have != want or not os.path.exists(so):
        tmp = so + f".build-{os.getpid()}"
        subprocess.run(
            ["g++", opt, "-shared", "-fPIC", "-std=c++17", "-o", tmp, src],
            check=True, capture_output=True)
        os.replace(tmp, so)
        with open(stamp, "w") as f:
            f.write(want)
    return so


def _bind(lib):
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [ctypes.c_char_p]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_vocab_size.restype = ctypes.c_int32
    lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
    lib.wp_is_ascii.restype = ctypes.c_int32
    lib.wp_is_ascii.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.wp_encode_batch.restype = ctypes.c_int32
    lib.wp_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    return lib


def load_wordpiece() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            _lib = _bind(ctypes.CDLL(_compile_cached(_SRC, _SO, "-O2")))
        except Exception:
            _lib = None
        return _lib


_IP_SRC = os.path.join(_DIR, "imageproc.cpp")
_IP_SO = os.path.join(_DIR, "_imageproc.so")
_ip_lib = None
_ip_tried = False


def _bind_imageproc(lib):
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ip_resize_bicubic_u8.restype = ctypes.c_int32
    lib.ip_resize_bicubic_u8.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, u8p]
    lib.ip_normalize_hwc.restype = ctypes.c_int32
    lib.ip_normalize_hwc.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float)]
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ip_image_to_patch_rows.restype = ctypes.c_int32
    lib.ip_image_to_patch_rows.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, f32p]
    lib.ip_image_to_patch_rows_u8.restype = ctypes.c_int32
    lib.ip_image_to_patch_rows_u8.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u8p]
    return lib


def image_to_patch_rows(lib, img, H: int, W: int, P: int, out_rows) -> int:
    """Scatter one contiguous f32/u8 (h, w, 3) image into a pre-zeroed
    (gh*gw, P*P*3) patch-row batch element (see imageproc.cpp)."""
    if img.dtype == np.uint8:
        u8p = ctypes.POINTER(ctypes.c_uint8)
        return lib.ip_image_to_patch_rows_u8(
            img.ctypes.data_as(u8p), img.shape[0], img.shape[1],
            H, W, P, out_rows.ctypes.data_as(u8p))
    f32p = ctypes.POINTER(ctypes.c_float)
    return lib.ip_image_to_patch_rows(
        img.ctypes.data_as(f32p), img.shape[0], img.shape[1],
        H, W, P, out_rows.ctypes.data_as(f32p))


def load_imageproc() -> Optional[ctypes.CDLL]:
    """PIL-bit-exact bicubic resize + fused inception normalize
    (imageproc.cpp); None -> callers use the PIL/numpy path."""
    global _ip_lib, _ip_tried
    with _lock:
        if _ip_lib is not None or _ip_tried:
            return _ip_lib
        _ip_tried = True
        try:
            _ip_lib = _bind_imageproc(
                ctypes.CDLL(_compile_cached(_IP_SRC, _IP_SO, "-O3")))
        except Exception:
            _ip_lib = None
        return _ip_lib

"""ctypes bindings for the native C++ preprocessing library.

Builds native/preprocess.cpp on first use (cached .so under native/build).
Falls back cleanly when a compiler is unavailable: `available()` returns
False and callers keep their pure-python/cv2 paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_ROOT, "native", "preprocess.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libmmde_preprocess.so")

_F32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_U8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_U16 = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-pthread", "-std=c++17",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.mmde_remap_u8.argtypes = [
            _U8, ctypes.c_int, ctypes.c_int, ctypes.c_int, _F32, _F32, _U8,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.mmde_remap_f32.argtypes = [
            _F32, ctypes.c_int, ctypes.c_int, _F32, _F32, _F32,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.mmde_normalize_crop_u8.argtypes = [
            _U8, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, _F32, ctypes.c_int]
        lib.mmde_depth_u16_to_m.argtypes = [
            _U16, ctypes.c_int, _F32, ctypes.c_int]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def remap_u8(img: np.ndarray, mapx: np.ndarray, mapy: np.ndarray,
             n_threads: int = 4) -> np.ndarray:
    """Bilinear remap of uint8 HWC (cv2.remap INTER_LINEAR/BORDER_CONSTANT
    semantics)."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img)
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    oh, ow = mapx.shape
    out = np.empty((oh, ow, ch) if img.ndim == 3 else (oh, ow), np.uint8)
    lib.mmde_remap_u8(img.reshape(h, w, ch), h, w, ch,
                      np.ascontiguousarray(mapx, np.float32),
                      np.ascontiguousarray(mapy, np.float32),
                      out.reshape(oh, ow, ch), oh, ow, n_threads)
    return out


def remap_f32(img: np.ndarray, mapx: np.ndarray, mapy: np.ndarray,
              n_threads: int = 4) -> np.ndarray:
    """Bilinear remap of float32 HW (depth maps)."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape
    oh, ow = mapx.shape
    out = np.empty((oh, ow), np.float32)
    lib.mmde_remap_f32(img, h, w,
                       np.ascontiguousarray(mapx, np.float32),
                       np.ascontiguousarray(mapy, np.float32),
                       out, oh, ow, n_threads)
    return out


def normalize_crop_u8(img: np.ndarray, top: int, left: int, oh: int, ow: int,
                      n_threads: int = 4) -> np.ndarray:
    """uint8 HWC -> float32 HWC/255 with crop, in one pass."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img)
    h, w, ch = img.shape
    out = np.empty((oh, ow, ch), np.float32)
    lib.mmde_normalize_crop_u8(img, h, w, ch, top, left, oh, ow, out,
                               n_threads)
    return out


def depth_u16_to_meters(raw: np.ndarray, n_threads: int = 2) -> np.ndarray:
    """uint16 depth payload -> float32 meters (/256/1000, VOID convention)."""
    lib = _load()
    assert lib is not None
    raw = np.ascontiguousarray(raw, np.uint16)
    out = np.empty(raw.shape, np.float32)
    lib.mmde_depth_u16_to_m(raw.reshape(-1), raw.size, out.reshape(-1),
                            n_threads)
    return out

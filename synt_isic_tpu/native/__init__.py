"""Native (C++) runtime components, loaded via ctypes.

`lib()` returns the compiled morphology library, building it on first use
with g++ (the toolchain is a framework requirement; scipy remains as a
pure-Python-deployment fallback in `xai/regions.py`).
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "morphology.cpp"
_SO = _DIR / "_morphology.so"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def lib() -> Optional[ctypes.CDLL]:
    """The morphology CDLL, or None when unavailable (no g++)."""
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _FAILED = True
                return None
        try:
            cdll = ctypes.CDLL(str(_SO))
        except OSError:
            _FAILED = True
            return None
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        for name in ("morph_dilate", "morph_erode", "morph_closing",
                     "morph_opening"):
            fn = getattr(cdll, name)
            fn.argtypes = [u8, u8, ctypes.c_int, ctypes.c_int,
                           ctypes.c_int, ctypes.c_int]
            fn.restype = None
        cdll.morph_label.argtypes = [u8, i32, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int]
        cdll.morph_label.restype = ctypes.c_int
        cdll.morph_remove_small.argtypes = [u8, ctypes.c_int, ctypes.c_int,
                                            ctypes.c_int, ctypes.c_int]
        cdll.morph_remove_small.restype = None
        _LIB = cdll
        return _LIB


def binary_closing(mask: np.ndarray, connectivity: int = 2,
                   iterations: int = 2) -> np.ndarray:
    cdll = lib()
    assert cdll is not None
    src = np.ascontiguousarray(mask, dtype=np.uint8)
    out = np.empty_like(src)
    cdll.morph_closing(src, out, src.shape[0], src.shape[1],
                       connectivity, iterations)
    return out.astype(bool)


def binary_opening(mask: np.ndarray, connectivity: int = 2,
                   iterations: int = 1) -> np.ndarray:
    cdll = lib()
    assert cdll is not None
    src = np.ascontiguousarray(mask, dtype=np.uint8)
    out = np.empty_like(src)
    cdll.morph_opening(src, out, src.shape[0], src.shape[1],
                       connectivity, iterations)
    return out.astype(bool)


def label(mask: np.ndarray, connectivity: int = 2):
    cdll = lib()
    assert cdll is not None
    src = np.ascontiguousarray(mask, dtype=np.uint8)
    labels = np.empty(src.shape, dtype=np.int32)
    n = cdll.morph_label(src, labels, src.shape[0], src.shape[1], connectivity)
    return labels, int(n)


def remove_small_components(mask: np.ndarray, min_size: int,
                            connectivity: int = 2) -> np.ndarray:
    cdll = lib()
    assert cdll is not None
    out = np.ascontiguousarray(mask, dtype=np.uint8).copy()
    cdll.morph_remove_small(out, out.shape[0], out.shape[1], connectivity,
                            min_size)
    return out.astype(bool)


def available() -> bool:
    return lib() is not None

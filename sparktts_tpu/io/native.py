"""ctypes bindings for the native audio runtime (csrc/sparktts_audio.cpp).

Builds the shared library on first use (g++, cached next to the source) and
degrades to None when a toolchain is unavailable — `io/audio.py` falls back
to numpy/scipy transparently.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_SRC = _CSRC / "sparktts_audio.cpp"
_LIB = _CSRC / "libsparkttsaudio.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-fopenmp",
        "-o",
        str(_LIB),
        str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.info("native audio build failed (%s); using numpy fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _SRC.exists() or not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            logger.info("native audio load failed (%s)", e)
            _load_failed = True
            return None

        lib.sparktts_resample_poly.restype = ctypes.c_int
        lib.sparktts_resample_poly.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.sparktts_volume_normalize.restype = ctypes.c_int
        lib.sparktts_volume_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_double,
        ]
        lib.sparktts_read_wav.restype = ctypes.c_int
        lib.sparktts_read_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.sparktts_write_wav.restype = ctypes.c_int
        lib.sparktts_write_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.sparktts_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _take_buffer(lib, ptr, n) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.sparktts_free(ptr)
    return arr


def resample(audio: np.ndarray, up: int, down: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, dtype=np.float64)
    out_ptr = ctypes.POINTER(ctypes.c_double)()
    out_len = ctypes.c_int64()
    rc = lib.sparktts_resample_poly(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        audio.shape[0],
        up,
        down,
        ctypes.byref(out_ptr),
        ctypes.byref(out_len),
    )
    if rc != 0:
        return None
    return _take_buffer(lib, out_ptr, out_len.value)


def volume_normalize(audio: np.ndarray, coeff: float = 0.2) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.ascontiguousarray(audio, dtype=np.float64).copy()
    rc = lib.sparktts_volume_normalize(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), buf.shape[0], coeff
    )
    return buf if rc == 0 else None


def read_wav(path) -> Optional[Tuple[np.ndarray, int]]:
    lib = get_lib()
    if lib is None:
        return None
    out_ptr = ctypes.POINTER(ctypes.c_double)()
    out_len = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.sparktts_read_wav(
        str(path).encode(), ctypes.byref(out_ptr), ctypes.byref(out_len), ctypes.byref(sr)
    )
    if rc != 0:
        return None
    return _take_buffer(lib, out_ptr, out_len.value), sr.value


def write_wav(path, audio: np.ndarray, sample_rate: int) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    buf = np.ascontiguousarray(audio, dtype=np.float64)
    rc = lib.sparktts_write_wav(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        buf.shape[0],
        int(sample_rate),
    )
    return rc == 0

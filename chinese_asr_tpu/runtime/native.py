"""Build + bind the first-party C++ runtime kernels via ctypes.

The reference leans on third-party native code (python-Levenshtein, kenlm);
here the native surface is first-party: compiled once on demand with g++
into a per-repo cache, loaded with ctypes, with pure-Python fallbacks if no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "_build")

_lock = threading.Lock()
_lib_holder = {"lib": None, "tried": False}


def _compile(src_path: str, name: str) -> Optional[str]:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    with open(src_path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_CACHE_DIR, f"{name}-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src_path, "-o", so_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so_path
    except Exception:
        return None


class _NativeLib:
    def __init__(self, cdll):
        self._lib = cdll
        self._lib.edit_distance_i32.restype = ctypes.c_int32
        self._lib.edit_distance_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        self._lib.batch_cer_i32.restype = None
        self._lib.batch_cer_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_double)]

    @staticmethod
    def _codes(s: str) -> np.ndarray:
        return np.frombuffer(s.encode("utf-32-le"), dtype=np.int32)

    def edit_distance(self, pred: str, ref: str) -> int:
        a = self._codes(pred)
        b = self._codes(ref)
        pa = a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if a.size else \
            ctypes.cast(0, ctypes.POINTER(ctypes.c_int32))
        pb = b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if b.size else \
            ctypes.cast(0, ctypes.POINTER(ctypes.c_int32))
        return int(self._lib.edit_distance_i32(pa, a.size, pb, b.size))

    def batch_cer(self, preds: List[str], refs: List[str]) -> float:
        n = len(preds)
        if n == 0:
            return 0.0
        p_codes = [self._codes(s) for s in preds]
        r_codes = [self._codes(s) for s in refs]
        p_off = np.zeros(n + 1, np.int64)
        r_off = np.zeros(n + 1, np.int64)
        np.cumsum([c.size for c in p_codes], out=p_off[1:])
        np.cumsum([c.size for c in r_codes], out=r_off[1:])
        p_flat = np.concatenate(p_codes) if p_off[-1] else np.zeros(1, np.int32)
        r_flat = np.concatenate(r_codes) if r_off[-1] else np.zeros(1, np.int32)
        out = np.zeros(n, np.float64)
        self._lib.batch_cer_i32(
            p_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            p_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            r_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            r_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return float(out.mean())


_adpcm_holder = {"fn": None, "tried": False}


def get_adpcm():
    """Return a callable ``(x_int16, out_uint8) -> None`` wrapping the C++
    ADPCM wire encoder (runtime/cpp/adpcm.cpp), or None if no toolchain.
    Bit-identical to the numpy encoder in audio/features.py (pinned by
    tests/test_wire.py); exists because the python-level block loop costs
    ~1 s/batch at the offline bench size on this one-core host."""
    with _lock:
        if _adpcm_holder["tried"]:
            return _adpcm_holder["fn"]
        _adpcm_holder["tried"] = True
        so = _compile(os.path.join(_CPP_DIR, "adpcm.cpp"), "adpcm")
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.adpcm_encode_i16.restype = None
            lib.adpcm_encode_i16.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8)]

            def encode(x: np.ndarray, out: np.ndarray) -> None:
                lib.adpcm_encode_i16(
                    x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                    ctypes.c_int64(x.size),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))

            _adpcm_holder["fn"] = encode
        except Exception:
            _adpcm_holder["fn"] = None
        return _adpcm_holder["fn"]


def get() -> Optional[_NativeLib]:
    """Return the native lib, compiling on first use; None if unavailable."""
    with _lock:
        if _lib_holder["tried"]:
            return _lib_holder["lib"]
        _lib_holder["tried"] = True
        src = os.path.join(_CPP_DIR, "edit_distance.cpp")
        so = _compile(src, "edit_distance")
        if so is not None:
            try:
                _lib_holder["lib"] = _NativeLib(ctypes.CDLL(so))
            except Exception:
                _lib_holder["lib"] = None
        return _lib_holder["lib"]

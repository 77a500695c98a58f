"""ctypes bindings for the native C++ bit packer (native/bitpack.cpp).

Compiled on demand with g++.  The build cache is keyed on a hash of the
source (native/libhscbitpack-<hash>.so), so a stale or foreign binary can
never shadow a changed bitpack.cpp — mtimes are meaningless after a git
checkout.  Every call site falls back to the vectorized-NumPy packer when the
toolchain is unavailable (set HSC_TPU_NO_NATIVE=1 to force the fallback).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "bitpack.cpp"))

_lib = None
_tried = False


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.abspath(
        os.path.join(_NATIVE_DIR, f"libhscbitpack-{digest}.so")
    )


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("HSC_TPU_NO_NATIVE"):
        return None
    try:
        path = _lib_path()
        if not os.path.exists(path):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", path, _SRC],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(path)
        lib.hsc_pack_events.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.hsc_unpack_events.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def pack_events(values: np.ndarray, widths: list[int]) -> bytes | None:
    """Native MSB-first pack; None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = values.shape[0]
    total = sum(widths)
    out = np.zeros((n * total + 7) // 8, dtype=np.uint8)
    if n:
        vals = np.ascontiguousarray(values, dtype=np.uint64)
        w = np.asarray(widths, dtype=np.int32)
        lib.hsc_pack_events(
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ctypes.c_int64(n),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int32(len(widths)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    return out.tobytes()


def unpack_events(data: bytes, n: int, widths: list[int]) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((n, len(widths)), dtype=np.uint64)
    if n:
        buf = np.frombuffer(data, dtype=np.uint8)
        w = np.asarray(widths, dtype=np.int32)
        lib.hsc_unpack_events(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int32(len(widths)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        )
    return out

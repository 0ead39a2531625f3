"""Native (C) production backends, built on demand with the system
compiler and loaded via ctypes. Python backends in svt_hevc_tpu.bitstream
remain the reference implementations; equivalence is test-enforced
(the analogue of the reference's C_DEFAULT-vs-ASM pairing and asm_test).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _build_lib() -> str | None:
    src = os.path.join(_HERE, "cabac.c")
    out = os.path.join(_HERE, "_libsvthevc_native.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-fPIC", "-shared", "-o", out, src],
                check=True, capture_output=True, timeout=120)
            return out
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def native_cabac_lib():
    """ctypes handle to the native library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build_lib()
        if path is not None:
            lib = ctypes.CDLL(path)
            lib.cabac_encode_ops.restype = ctypes.c_int64
            lib.cabac_encode_ops.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
            _LIB = lib
    return _LIB


def cabac_encode_ops(ops: np.ndarray, contexts: list[int]) -> bytes | None:
    """Run the native arithmetic coder over a recorded op stream.
    Returns the slice payload bytes, or None if the native lib is
    unavailable (callers fall back to the Python backend)."""
    lib = native_cabac_lib()
    if lib is None:
        return None
    ops = np.ascontiguousarray(ops, dtype=np.int32)
    ctx = np.asarray(contexts, dtype=np.uint8)
    cap = max(4096, ops.shape[0] * 2 + 1024)
    out = np.empty(cap, np.uint8)
    n = lib.cabac_encode_ops(
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ops.shape[0],
        ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap)
    if n < 0:
        raise RuntimeError(f"native cabac overflow/err {n}")
    return out[:n].tobytes()

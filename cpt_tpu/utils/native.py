"""ctypes bindings for the native TSV codec (``native/tsv_codec.cc``).

Auto-builds ``libtsv_codec.so`` on first use (g++ is available in the
image); every entry point has a pure-python fallback so the framework works
without a toolchain. ``decode_features_native`` is wired into
``cpt_tpu.utils.tsv.decode_features`` when available.
"""
from __future__ import annotations

import ctypes
import os
import os.path as op
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = op.join(op.dirname(op.dirname(op.dirname(op.abspath(__file__)))),
                      "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = op.join(_NATIVE_DIR, "libtsv_codec.so")
    if not op.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.decode_features_f32.restype = ctypes.c_int64
    lib.decode_features_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
    lib.scan_lineidx.restype = ctypes.c_int64
    lib.scan_lineidx.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int64),
                                 ctypes.c_int64]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_features_native(b64_list: Sequence[str], dim: int
                           ) -> Optional[np.ndarray]:
    """Batch base64 → float32 [n, dim]; None if unavailable/mismatched."""
    lib = _load()
    if lib is None or not b64_list:
        return None
    blobs = [s.encode("ascii") for s in b64_list]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    for i, b in enumerate(blobs):
        offsets[i + 1] = offsets[i] + len(b)
    flat = b"".join(blobs)
    out = np.empty((len(blobs), dim), np.float32)
    rc = lib.decode_features_f32(
        flat, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(blobs), dim, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out


def scan_lineidx_native(path: str, max_lines: int = 1 << 24
                        ) -> Optional[List[int]]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(max_lines, np.int64)
    n = lib.scan_lineidx(path.encode(),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                         max_lines)
    if n < 0:
        return None
    return out[:n].tolist()

"""Native (C++) host-side components.

The reference leans on native libraries for its runtime (libcorrect Viterbi,
libacars, libzmq; SURVEY.md §2).  Here the TPU compute path is JAX/Pallas,
and the host-side hot spots get native equivalents:

- ``libaeroviterbi.so``: K=7 r=1/2 soft Viterbi (libcorrect replacement)
  used by StreamingViterbi for single-frame host decodes.

The library is built on demand with g++ if the shared object is missing;
everything degrades gracefully to the pure-JAX implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libaeroviterbi.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        src = os.path.join(_DIR, "viterbi.cc")
        try:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _SO, src],
                           check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        _lib = ctypes.CDLL(_SO)
        _lib.aero_viterbi_decode_soft.restype = ctypes.c_int
        _lib.aero_viterbi_decode_soft.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib.aero_viterbi_decode_soft_batch.restype = ctypes.c_int
        _lib.aero_viterbi_decode_soft_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
    except OSError:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def viterbi_decode_soft_native(soft) -> np.ndarray:
    """soft: array-like of soft bytes (0..255); returns hard bits [T//2]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native viterbi unavailable")
    soft = np.ascontiguousarray(np.clip(np.asarray(soft), 0, 255),
                                dtype=np.uint8)
    out = np.empty(soft.size // 2, np.uint8)
    lib.aero_viterbi_decode_soft(
        soft.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), soft.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out

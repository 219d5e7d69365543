"""Native (C++) runtime components, bound via ctypes.

Currently: a GIL-releasing NIfTI loader (gzip inflate + header parse + single
cast pass) used as the fast path of the host input pipeline.  Builds itself
with g++ on first use and caches the .so next to the source; every entry
point falls back to the pure-python implementation if the toolchain or zlib
is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "nifti_loader.cpp")
_SO = os.path.join(_HERE, "libnifti_loader.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.isfile(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib_failed = True
            return None
        lib.nifti_read_header.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.nifti_read_header.restype = ctypes.c_int
        lib.nifti_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                   ctypes.c_int64, ctypes.c_int]
        lib.nifti_read.restype = ctypes.c_int64
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def read_nifti_fast(path: str, dtype: str = "float32"):
    """Fast NIfTI read -> (F-ordered array, affine, VolumeHeader), or None if
    the native path can't handle this file (caller falls back to python).

    dtype: 'float32' (scl_slope applied) or 'int32' (raw cast).
    """
    lib = get_lib()
    if lib is None:
        return None
    hdr = ctypes.create_string_buffer(348)
    if lib.nifti_read_header(path.encode(), hdr) != 0:
        return None
    raw = hdr.raw
    if struct.unpack("<i", raw[0:4])[0] != 348:
        return None  # big-endian or foreign file: python path handles it

    from ..io.nifti import VolumeHeader, _nifti_affine, _parse_nifti1_header

    parsed = _parse_nifti1_header(raw)
    ndim = int(parsed["dim"][0])
    shape = tuple(int(s) for s in parsed["dim"][1:1 + ndim])
    n = int(np.prod(shape)) if shape else 1

    out_code = 0 if dtype == "float32" else 1
    out = np.empty(n, dtype=np.float32 if out_code == 0 else np.int32)
    got = lib.nifti_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                         out.nbytes, out_code)
    if got != n:
        return None
    data = out.reshape(shape, order="F")
    aff = _nifti_affine(parsed)
    header = VolumeHeader(zooms=np.abs(np.asarray(parsed["pixdim"][1:4], np.float32)),
                          dtype=data.dtype, shape=shape)
    return data, aff, header

"""ctypes binding for the native ragged kernels (ragged_kernels.cc).

The shared library is built on demand with g++ (single translation unit,
no Python.h / pybind) and cached next to the source; if the toolchain is
missing or the build fails, ``lib()`` returns None and callers fall back
to the numpy kernels — outputs are bit-identical either way
(tests/data/test_native.py).

Set ``EBNERD_TPU_NO_NATIVE=1`` to force the numpy path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["lib", "build", "gather_ranges", "to_padded", "map_ids", "isin_per_row"]

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "ragged_kernels.cc"
_SO = _HERE / "_ragged_kernels.so"
_lock = threading.Lock()
_lib = None
_tried = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def build(force: bool = False) -> bool:
    """Compile ragged_kernels.cc -> _ragged_kernels.so. Returns success.

    Safe against concurrent builders (pytest-xdist, multi-host launch):
    compiles to a process-unique temp path and os.rename()s it into place
    (atomic on POSIX), so no process can dlopen a partially written file."""
    if _SO.exists() and not force and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    tmp = _SO.with_suffix(f".tmp.{os.getpid()}.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(tmp)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except (OSError, subprocess.SubprocessError):
        tmp.unlink(missing_ok=True)
        return False


def _bind(dll: ctypes.CDLL) -> ctypes.CDLL:
    dll.gather_ranges_i32.argtypes = [_i32p, _i64p, _i64p, ctypes.c_int64, _i32p]
    dll.gather_ranges_i64.argtypes = [_i64p, _i64p, _i64p, ctypes.c_int64, _i64p]
    dll.gather_ranges_f32.argtypes = [_f32p, _i64p, _i64p, ctypes.c_int64, _f32p]
    dll.to_padded_i32.argtypes = [
        _i32p, _i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, _i32p, _u8p]
    dll.map_ids_i64.argtypes = [_i64p, ctypes.c_int64, _i64p, ctypes.c_int64, _i32p]
    dll.isin_per_row_i64.argtypes = [_i64p, _i64p, _i64p, _i64p, ctypes.c_int64, _u8p]
    for f in (dll.gather_ranges_i32, dll.gather_ranges_i64, dll.gather_ranges_f32,
              dll.to_padded_i32, dll.map_ids_i64, dll.isin_per_row_i64):
        f.restype = None
    return dll


def lib() -> ctypes.CDLL | None:
    """The loaded native library, building it on first use; None if
    unavailable (no g++, build failure, or EBNERD_TPU_NO_NATIVE=1)."""
    global _lib, _tried
    if os.environ.get("EBNERD_TPU_NO_NATIVE") == "1":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if build():
                _lib = _bind(ctypes.CDLL(str(_SO)))
        except OSError:
            _lib = None
        return _lib


_GATHER = {"int32": "gather_ranges_i32", "int64": "gather_ranges_i64",
           "float32": "gather_ranges_f32"}


def gather_ranges(values: np.ndarray, starts: np.ndarray,
                  lengths: np.ndarray, total: int) -> np.ndarray | None:
    """Fused _ranges + values[idx]: concatenated values[starts[i]:+lengths[i]].
    Returns None when the native path is unavailable for this dtype."""
    dll = lib()
    name = _GATHER.get(values.dtype.name)
    if dll is None or name is None or not values.flags.c_contiguous:
        return None
    out = np.empty(total, dtype=values.dtype)
    getattr(dll, name)(values, np.ascontiguousarray(starts, np.int64),
                       np.ascontiguousarray(lengths, np.int64),
                       len(starts), out)
    return out


def to_padded(values: np.ndarray, offsets: np.ndarray, width: int,
              pad_value, align_right: bool) -> tuple[np.ndarray, np.ndarray] | None:
    dll = lib()
    if dll is None or values.dtype != np.int32 or not values.flags.c_contiguous:
        return None
    n = len(offsets) - 1
    out = np.full((n, width), pad_value, dtype=np.int32)
    mask = np.zeros((n, width), dtype=np.uint8)
    dll.to_padded_i32(values, np.ascontiguousarray(offsets, np.int64),
                      n, width, int(align_right), out, mask)
    return out, mask.astype(bool)


def map_ids(sorted_ids: np.ndarray, query: np.ndarray) -> np.ndarray | None:
    dll = lib()
    if dll is None:
        return None
    sorted_ids = np.ascontiguousarray(sorted_ids, np.int64)
    query64 = np.ascontiguousarray(query, np.int64)
    out = np.empty(query64.shape[0], dtype=np.int32)
    dll.map_ids_i64(sorted_ids, len(sorted_ids), query64, len(query64), out)
    return out


def isin_per_row(a_values: np.ndarray, a_offsets: np.ndarray,
                 b_values: np.ndarray, b_offsets: np.ndarray) -> np.ndarray | None:
    dll = lib()
    if dll is None:
        return None
    a64 = np.ascontiguousarray(a_values, np.int64)
    b64 = np.ascontiguousarray(b_values, np.int64)
    out = np.empty(a64.shape[0], dtype=np.uint8)
    dll.isin_per_row_i64(a64, np.ascontiguousarray(a_offsets, np.int64),
                         b64, np.ascontiguousarray(b_offsets, np.int64),
                         len(a_offsets) - 1, out)
    return out.astype(bool)

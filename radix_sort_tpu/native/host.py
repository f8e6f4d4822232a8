"""ctypes bindings for the native host radix sort (host_radix.cpp).

The shared library is compiled on first use with g++ (no pybind11 in this
environment; plain C ABI + ctypes). If no compiler is available the wrappers
fall back to numpy's stable sort so the host API always works.

Key dtypes are mapped into unsigned rank space with the same bit transforms
as the device path (radix_sort_tpu.keys, mirroring the reference's
RadixDigits impls, src/radix_sort/radix_digits.rs) — the native kernel only
ever sees uint32/uint64 words.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["host_sort", "host_sort_pairs", "native_available"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_radix.cpp")
_LIB_DIR = os.path.join(_HERE, "_build")
_LIB = os.path.join(_LIB_DIR, "librst_host.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> str | None:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return _LIB
    except (OSError, subprocess.SubprocessError):
        return None


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB if os.path.exists(_LIB) else _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        i64, i32 = ctypes.c_int64, ctypes.c_int
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.rst_sort_u32.argtypes = [u32p, u32p, i64, i32]
        lib.rst_sort_u64.argtypes = [u64p, u64p, i64, i32]
        lib.rst_sort_pairs_u32.argtypes = [u32p, u32p, u32p, u32p, i64, i32]
        lib.rst_sort_pairs_u64.argtypes = [u64p, u64p, u64p, u64p, i64, i32]
        lib.rst_num_threads.restype = i32
        _lib = lib
        return _lib


def native_available() -> bool:
    """True if the C++ kernel compiled (or was cached) successfully."""
    return _load() is not None


# ---- numpy-side order-preserving bit transforms (host mirror of keys.py)

def _encode_np(x: np.ndarray) -> tuple[np.ndarray, np.dtype]:
    dt = x.dtype
    if dt.kind == "u":
        return x, dt
    if dt.kind == "i":
        u = np.dtype(f"u{dt.itemsize}")
        return (x.view(u) ^ np.asarray(np.iinfo(dt).min, dt).view(u)), dt
    if dt.kind == "f":
        i = np.dtype(f"i{dt.itemsize}")
        u = np.dtype(f"u{dt.itemsize}")
        b = x.view(i)
        mask = (b >> (dt.itemsize * 8 - 1)) | np.iinfo(i).min
        return (b ^ mask).view(u), dt
    raise TypeError(f"unsupported key dtype: {dt}")


def _decode_np(w: np.ndarray, dt: np.dtype) -> np.ndarray:
    if dt.kind == "u":
        return w
    if dt.kind == "i":
        u = w.dtype
        return (w ^ np.asarray(np.iinfo(dt).min, dt).view(u)).view(dt)
    i = np.dtype(f"i{dt.itemsize}")
    e = w.view(i)
    mask = (~e >> (dt.itemsize * 8 - 1)) | np.iinfo(i).min
    return (e ^ mask).view(dt)


def _widen(w: np.ndarray) -> np.ndarray:
    """Sub-32-bit words sort through the u32 kernel (order-preserving)."""
    if w.dtype.itemsize < 4:
        return w.astype(np.uint32)
    return w


def host_sort(keys: np.ndarray, threads: int | None = None) -> np.ndarray:
    """Stable total-order host sort (C++ LSD radix; numpy fallback)."""
    w, dt = _encode_np(np.ascontiguousarray(keys))
    orig_w_dtype = w.dtype
    w = _widen(w).copy()
    lib = _load()
    if lib is None:
        w.sort(kind="stable")
    else:
        t = threads or lib.rst_num_threads()
        tmp = np.empty_like(w)
        fn = lib.rst_sort_u32 if w.dtype == np.uint32 else lib.rst_sort_u64
        ptr = np.ctypeslib.as_ctypes(w)
        tptr = np.ctypeslib.as_ctypes(tmp)
        fn(
            ctypes.cast(ptr, fn.argtypes[0]),
            ctypes.cast(tptr, fn.argtypes[1]),
            w.shape[0],
            t,
        )
    return _decode_np(w.astype(orig_w_dtype), keys.dtype)


def host_sort_pairs(
    keys: np.ndarray, values: np.ndarray, threads: int | None = None
):
    """Stable host key/payload sort. Payload must be 32- or 64-bit."""
    if values.shape[0] != keys.shape[0]:
        raise ValueError("keys and values must have the same length")
    w, dt = _encode_np(np.ascontiguousarray(keys))
    orig_w_dtype = w.dtype
    w = _widen(w).copy()
    v = np.ascontiguousarray(values)
    vv = v.view(np.dtype(f"u{v.dtype.itemsize}")).copy()
    lib = _load()
    if lib is None or vv.dtype.itemsize != w.dtype.itemsize:
        perm = np.argsort(w, kind="stable")
        w, vv = w[perm], vv[perm]
    else:
        t = threads or lib.rst_num_threads()
        tk, tv = np.empty_like(w), np.empty_like(vv)
        fn = (
            lib.rst_sort_pairs_u32
            if w.dtype == np.uint32
            else lib.rst_sort_pairs_u64
        )
        fn(
            ctypes.cast(np.ctypeslib.as_ctypes(w), fn.argtypes[0]),
            ctypes.cast(np.ctypeslib.as_ctypes(vv), fn.argtypes[1]),
            ctypes.cast(np.ctypeslib.as_ctypes(tk), fn.argtypes[2]),
            ctypes.cast(np.ctypeslib.as_ctypes(tv), fn.argtypes[3]),
            w.shape[0],
            t,
        )
    return (
        _decode_np(w.astype(orig_w_dtype), keys.dtype),
        vv.view(values.dtype),
    )

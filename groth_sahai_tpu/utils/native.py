"""ctypes bindings for the native (C++) host-side kernels.

The framework's IO/runtime path: bulk byte <-> limb conversion and scalar
digit extraction run in csrc/libgslimbs.so at memory bandwidth (the Python
loops in ops/limbs.py cost seconds for MSM-sized batches). Falls back to
numpy implementations when the library isn't built.

Build: `make -C csrc` (g++, no external deps).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _build(csrc_dir: str) -> bool:
    """Compile libgslimbs.so in-tree (one g++ invocation, no deps).

    Runs at most once per process when the library is absent OR stale
    (limbs.cpp newer than the .so); disable with GS_NATIVE_BUILD=0.  The
    compiler writes to a process-unique temp name which is os.rename()d
    into place, so concurrent builders (parallel test workers, multi-host
    launch) can never dlopen a half-written library.  Build failures emit
    a one-time warning instead of silently dropping to the slow fallback.
    """
    if os.environ.get("GS_NATIVE_BUILD", "1") == "0":
        return False
    import subprocess
    src = os.path.join(csrc_dir, "limbs.cpp")
    out = os.path.join(csrc_dir, "libgslimbs.so")
    if not os.path.exists(src):
        return False
    tmp = out + f".tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", tmp, src],
            check=True, capture_output=True, timeout=120)
        os.rename(tmp, out)          # atomic on the same filesystem
    except Exception as e:           # noqa: BLE001 -- warn, use fallback
        import warnings
        warnings.warn(f"native libgslimbs build failed ({e!r}); "
                      "falling back to numpy limb codecs", RuntimeWarning)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False
    return os.path.exists(out)


def _stale(src: str, lib: str) -> bool:
    try:
        return os.path.getmtime(src) > os.path.getmtime(lib)
    except OSError:
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    csrc = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                        "..", "csrc"))
    path = os.path.join(csrc, "libgslimbs.so")
    if (not os.path.exists(path)
            or _stale(os.path.join(csrc, "limbs.cpp"), path)):
        _build(csrc)
    try:
        lib = ctypes.CDLL(path)
        lib.bytes_to_limbs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.limbs_to_bytes.argtypes = lib.bytes_to_limbs.argtypes
        lib.scalar_digits.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


def bytes_to_limbs(data: bytes, nbytes: int, n_limbs: int) -> np.ndarray:
    """Packed LE field-element bytes -> uint32[n_limbs, batch]."""
    batch = len(data) // nbytes
    lib = _load()
    out = np.empty((n_limbs, batch), dtype=np.uint32)
    if lib:
        buf = np.frombuffer(data, dtype=np.uint8)
        lib.bytes_to_limbs(buf.ctypes.data, out.ctypes.data,
                           batch, nbytes, n_limbs)
        return out
    arr = np.frombuffer(data, dtype=np.uint8).reshape(batch, nbytes)
    for l in range(n_limbs):
        lo = arr[:, 2 * l] if 2 * l < nbytes else 0
        hi = arr[:, 2 * l + 1].astype(np.uint32) << 8 \
            if 2 * l + 1 < nbytes else 0
        out[l] = lo + hi
    return out


def limbs_to_bytes(limbs: np.ndarray, nbytes: int) -> bytes:
    """uint32[n_limbs, batch] -> packed LE bytes (batch x nbytes)."""
    limbs = np.ascontiguousarray(limbs, dtype=np.uint32)
    n_limbs, batch = limbs.shape
    lib = _load()
    out = np.zeros(batch * nbytes, dtype=np.uint8)
    if lib:
        lib.limbs_to_bytes(limbs.ctypes.data, out.ctypes.data,
                           batch, nbytes, n_limbs)
        return out.tobytes()
    view = out.reshape(batch, nbytes)
    for l in range(n_limbs):
        if 2 * l < nbytes:
            view[:, 2 * l] = limbs[l] & 0xFF
        if 2 * l + 1 < nbytes:
            view[:, 2 * l + 1] = (limbs[l] >> 8) & 0xFF
    return out.tobytes()


def scalar_digits(limbs: np.ndarray, window: int) -> np.ndarray:
    """uint32[n_limbs, batch] scalars -> uint32[n_windows, batch] digits."""
    limbs = np.ascontiguousarray(limbs, dtype=np.uint32)
    n_limbs, batch = limbs.shape
    n_windows = -(-256 // window)
    lib = _load()
    out = np.empty((n_windows, batch), dtype=np.uint32)
    if lib:
        lib.scalar_digits(limbs.ctypes.data, out.ctypes.data,
                          batch, n_limbs, window, n_windows)
        return out
    mask = (1 << window) - 1
    for k in range(n_windows):
        lo_bit = k * window
        li, off = lo_bit // 16, lo_bit % 16
        d = limbs[li] >> off if li < n_limbs else np.zeros(batch, np.uint32)
        have = 16 - off
        if have < window and li + 1 < n_limbs:
            d = d | (limbs[li + 1] << have)
        out[k] = d & mask
    return out

"""ctypes bindings for the native host-ops library (csrc/host_ops.cpp).

Auto-builds ``libparadis_host.so`` with g++ on first use (cached under
``csrc/build``).  All callers degrade gracefully to the pure-Python/numpy
implementations when no compiler or zlib headers are available — the native
path is a production-host throughput optimization, not a requirement.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger("paradis_tpu")

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "host_ops.cpp"
_BUILD_DIR = _SRC.parent / "build"
_LIB_PATH = _BUILD_DIR / "libparadis_host.so"

_lib = None
_tried = False

U8P = ctypes.POINTER(ctypes.c_uint8)


def build(force: bool = False) -> Path | None:
    """Compile the shared library; returns its path or None on failure."""
    if _LIB_PATH.exists() and not force:
        if not force and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime:
            return _LIB_PATH
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
           "-o", str(_LIB_PATH), "-lz", "-lzstd", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.debug("native host-ops build failed: %s", e)
        return None


def get_lib():
    """Load (building if needed); returns the ctypes lib or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.zlib_decode_many.restype = ctypes.c_int
    lib.zlib_decode_many.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
    ]
    lib.zscore_normalize_inplace.restype = None
    lib.zscore_normalize_inplace.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
    ]
    lib.bitround_inplace.restype = None
    lib.bitround_inplace.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64, ctypes.c_int,
    ]
    lib.blosc_decode_frame.restype = ctypes.c_int
    lib.blosc_decode_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, U8P, ctypes.c_int64,
    ]
    lib.blosc_encode_frame.restype = ctypes.c_int64
    lib.blosc_encode_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int64, U8P, ctypes.c_int64,
    ]
    lib.blosc_decode_many.restype = ctypes.c_int
    lib.blosc_decode_many.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def default_threads() -> int:
    return max(1, (os.cpu_count() or 1))


def zlib_decode_many(blobs: list[bytes | None], chunk_bytes: int,
                     out: np.ndarray | None = None,
                     n_threads: int | None = None) -> np.ndarray | None:
    """Decode N zlib blobs into a contiguous [N * chunk_bytes] uint8 buffer.

    Missing blobs (None) leave their slot as-is (caller pre-fills with the
    fill value).  Returns None if the native lib is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(blobs)
    if out is None:
        out = np.zeros(n * chunk_bytes, np.uint8)
    keepalive = [b if b is not None else b"" for b in blobs]
    srcs = (ctypes.c_char_p * n)(*[
        ctypes.cast(ctypes.c_char_p(b), ctypes.c_char_p) if blobs[i] is not None else None
        for i, b in enumerate(keepalive)
    ])
    lens = (ctypes.c_int64 * n)(*[len(b) if b else 0 for b in keepalive])
    rc = lib.zlib_decode_many(
        srcs, lens, out.ctypes.data_as(ctypes.c_char_p),
        ctypes.c_int64(chunk_bytes), ctypes.c_int(n),
        ctypes.c_int(n_threads or default_threads()),
    )
    if rc != 0:
        raise ValueError(f"zlib decode failed for chunk {rc - 1}")
    return out


def blosc_decode_many(blobs: list[bytes | None], chunk_bytes: int,
                      out: np.ndarray | None = None,
                      n_threads: int | None = None) -> np.ndarray | None:
    """Decode N Blosc-1 frames into a contiguous [N * chunk_bytes] buffer.

    Same contract as ``zlib_decode_many``; returns None when the native lib
    is unavailable (caller falls back to per-chunk python decode).
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(blobs)
    if out is None:
        out = np.zeros(n * chunk_bytes, np.uint8)
    keepalive = [b if b is not None else b"" for b in blobs]
    srcs = (ctypes.c_char_p * n)(*[
        ctypes.cast(ctypes.c_char_p(b), ctypes.c_char_p)
        if blobs[i] is not None else None
        for i, b in enumerate(keepalive)
    ])
    lens = (ctypes.c_int64 * n)(*[len(b) if b else 0 for b in keepalive])
    rc = lib.blosc_decode_many(
        srcs, lens, out.ctypes.data_as(ctypes.c_char_p),
        ctypes.c_int64(chunk_bytes), ctypes.c_int(n),
        ctypes.c_int(n_threads or default_threads()),
    )
    if rc != 0:
        raise ValueError(f"blosc decode failed for chunk {rc - 1}")
    return out


def zscore_normalize_inplace(data: np.ndarray, chan_idx: np.ndarray,
                             mean: np.ndarray, std: np.ndarray,
                             n_threads: int | None = None) -> bool:
    """Fused in-place (x-mean)/std over selected trailing channels.

    ``data`` is C-contiguous float32 [..., C].  Returns False when the native
    lib is unavailable (caller falls back to numpy).
    """
    lib = get_lib()
    if lib is None:
        return False
    if data.dtype != np.float32 or not data.flags.c_contiguous:
        return False
    channels = data.shape[-1]
    n_px = data.size // channels
    idx = np.ascontiguousarray(chan_idx, np.int64)
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    lib.zscore_normalize_inplace(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_px), ctypes.c_int64(channels),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(idx)), ctypes.c_int(n_threads or default_threads()),
    )
    return True


def bitround_inplace(data: np.ndarray, keepbits: int) -> bool:
    lib = get_lib()
    if lib is None or data.dtype != np.float32 or not data.flags.c_contiguous:
        return False
    bits = data.view(np.uint32)
    lib.bitround_inplace(
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(bits.size), ctypes.c_int(keepbits),
    )
    return True


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Build the native host-ops library.")
    p.add_argument("--build", action="store_true")
    p.add_argument("--force", action="store_true")
    args = p.parse_args()
    path = build(force=args.force)
    print(f"native host-ops: {path or 'build failed (pure-python fallback active)'}")

"""Native (C++) runtime tier.

The reference's native tier is CUDA kernels plus native pip deps (lz4,
pycryptodome). Our compute-path native tier is JAX/XLA/Pallas; this package
holds the host-side native runtime pieces, built with g++ and loaded through
ctypes (no pybind11 required):

- ``lz4frame.cpp`` — LZ4 frame codec so episode logs round-trip in the same
  ``.lz4`` format the reference writes via python-lz4
  (reference foundation/utils.py:18-43).

The shared library is compiled on first use and cached next to the sources;
every entry point degrades gracefully (raises ImportError) when no toolchain
is available, and callers fall back to pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_aet_native.so")
_SRC = os.path.join(_HERE, "lz4frame.cpp")

_lock = threading.Lock()
_lib = None
_load_error: Exception | None = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO_PATH + ".tmp",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO_PATH + ".tmp", _SO_PATH)


def _load():
    global _lib, _load_error
    with _lock:
        if _lib is not None:
            return _lib
        if _load_error is not None:
            raise ImportError("native library unavailable") from _load_error
        try:
            if (not os.path.exists(_SO_PATH)) or (
                os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_SO_PATH)
            lib.aet_lz4f_compress_bound.restype = ctypes.c_size_t
            lib.aet_lz4f_compress_bound.argtypes = [ctypes.c_size_t]
            lib.aet_lz4f_compress.restype = ctypes.c_ssize_t
            lib.aet_lz4f_compress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_char), ctypes.c_size_t,
            ]
            lib.aet_lz4f_content_size.restype = ctypes.c_ssize_t
            lib.aet_lz4f_content_size.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
            lib.aet_lz4f_decompress.restype = ctypes.c_ssize_t
            lib.aet_lz4f_decompress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_char), ctypes.c_size_t,
            ]
            lib.aet_xxh32.restype = ctypes.c_uint32
            lib.aet_xxh32.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint32,
            ]
            _lib = lib
            return _lib
        except Exception as e:  # toolchain missing, build failure, ...
            _load_error = e
            raise ImportError("failed to build native library") from e


def available() -> bool:
    try:
        _load()
        return True
    except ImportError:
        return False


def lz4_compress(data: bytes) -> bytes:
    """Compress bytes into a standard LZ4 frame."""
    lib = _load()
    cap = lib.aet_lz4f_compress_bound(len(data))
    out = ctypes.create_string_buffer(cap)
    n = lib.aet_lz4f_compress(data, len(data), out, cap)
    if n < 0:
        raise ValueError("lz4 frame compression failed")
    return out.raw[:n]


def lz4_decompress(data: bytes) -> bytes:
    """Decompress a standard LZ4 frame (as written by us or python-lz4)."""
    lib = _load()
    cs = lib.aet_lz4f_content_size(data, len(data))
    if cs < 0:
        raise ValueError("not an LZ4 frame")
    # No content-size field: grow the buffer geometrically.
    cap = cs if cs > 0 else max(4 * len(data), 1 << 16)
    while True:
        out = ctypes.create_string_buffer(cap)
        n = lib.aet_lz4f_decompress(data, len(data), out, cap)
        if n >= 0:
            return out.raw[:n]
        if cs > 0 or cap > (1 << 31):
            raise ValueError("lz4 frame decompression failed")
        cap *= 4


def xxh32(data: bytes, seed: int = 0) -> int:
    return int(_load().aet_xxh32(data, len(data), seed))

"""Native C++ runtime bindings (ctypes).

Components:
  * LZ4 block codec (lz4.cpp) — replaces the reference's python-lz4
    dependency for keyframe thumbnail compression
    (reference: slam/core/keyframe_utils.py:26-30).
  * Frame prefetcher (prefetch.cpp, when present) — threaded file reader
    feeding the host->device pipeline.

The shared library is built on demand with g++ (see build.py). If the
toolchain is unavailable the LZ4 paths fall back to zlib (stdlib) with a
format tag byte so the two never mix.
"""
from __future__ import annotations

import ctypes
import os
import zlib

_LIB = None
_TAG_LZ4 = b"\x4c"   # 'L'
_TAG_ZLIB = b"\x5a"  # 'Z'


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    from . import build as _build

    try:
        if _build.needs_build():
            _build.build()
        lib = ctypes.CDLL(_build.OUT)
        lib.slam_lz4_bound.restype = ctypes.c_size_t
        lib.slam_lz4_bound.argtypes = [ctypes.c_size_t]
        lib.slam_lz4_compress.restype = ctypes.c_size_t
        lib.slam_lz4_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t]
        lib.slam_lz4_decompress.restype = ctypes.c_size_t
        lib.slam_lz4_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t]
        try:
            lib.slam_prefetch_start.restype = ctypes.c_void_p
            lib.slam_prefetch_start.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
            lib.slam_prefetch_stop.restype = None
            lib.slam_prefetch_stop.argtypes = [ctypes.c_void_p]
        except Exception:
            pass  # stale .so without the prefetcher; lz4 still works
        _LIB = lib
    except Exception:
        _LIB = False  # toolchain unavailable; zlib fallback
    return _LIB


def lz4_available() -> bool:
    return bool(_load())


def compress(data: bytes) -> bytes:
    """Compress bytes; container = tag(1B) + u32 orig_len + payload."""
    lib = _load()
    header = len(data).to_bytes(4, "little")
    if lib:
        bound = lib.slam_lz4_bound(len(data))
        out = ctypes.create_string_buffer(bound)
        n = lib.slam_lz4_compress(data, len(data), out, bound)
        if n:
            return _TAG_LZ4 + header + out.raw[:n]
    return _TAG_ZLIB + header + zlib.compress(data, 6)


class FilePrefetcher:
    """Background readahead of an upcoming file list (native thread).

    Wraps prefetch.cpp's ``slam_prefetch_start/stop``: pulls the files
    through the OS page cache ahead of the decoder. No-op (but safe) when
    the native library is unavailable.
    """

    def __init__(self, paths):
        self._handle = None
        lib = _load()
        if not lib or not hasattr(lib, "slam_prefetch_start"):
            return
        paths = [p for p in paths if isinstance(p, str)]
        if not paths:
            return
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._lib = lib
        self._handle = lib.slam_prefetch_start(arr, len(paths))
        self._keepalive = arr

    def stop(self) -> None:
        if self._handle:
            self._lib.slam_prefetch_stop(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.stop()
        except Exception:
            pass


def decompress(blob: bytes) -> bytes:
    tag, orig_len = blob[:1], int.from_bytes(blob[1:5], "little")
    payload = blob[5:]
    if tag == _TAG_ZLIB:
        return zlib.decompress(payload)
    if tag != _TAG_LZ4:
        raise ValueError("unknown compression tag")
    lib = _load()
    if not lib:
        raise RuntimeError("lz4 payload but native library unavailable")
    out = ctypes.create_string_buffer(orig_len)
    n = lib.slam_lz4_decompress(payload, len(payload), out, orig_len)
    if n != orig_len:
        raise ValueError("corrupt lz4 stream")
    return out.raw

"""Python bindings for the native host codec (native/codec.c).

Each function returns None when the native library is unavailable so
callers can fall back to the pure-Python engine — the same graceful
degradation the reference applies to its CUDA path (reference
src/batch.rs:23-27).
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import get_lib
from ..utils.errors import (
    BadDataError,
    InsufficientSpaceError,
    ShortInputError,
)

_ERR_BADDATA = -1
_ERR_SPACE = -2
_ERR_SHORT = -3

_HASH_SIZE = 1 << 15

_work_cache = np.zeros(0, np.int32)


def _work(total: int) -> np.ndarray:
    global _work_cache
    need = 2 * _HASH_SIZE + total
    if _work_cache.size < need:
        _work_cache = np.zeros(int(need * 1.5) + 1024, np.int32)
    return _work_cache


def native_available() -> bool:
    return get_lib() is not None


def native_deflate(data: bytes, level: int, flush: int,
                   history: bytes = b"") -> bytes | None:
    """Raw DEFLATE of `data` (with LZ history), levels 1-12.
    flush: 1 = SYNC, 2 = FINISH. None => no native library."""
    lib = get_lib()
    if lib is None or not (1 <= level <= 12):
        return None
    buf = history + data
    total = len(buf)
    cap = total + (total >> 3) + 4096
    out = np.empty(cap, np.uint8)
    src = np.frombuffer(buf, np.uint8) if total else np.zeros(1, np.uint8)
    work = _work(total)
    n = lib.deflate_c(src.ctypes.data, len(history), total, level, flush,
                      out.ctypes.data, cap, work.ctypes.data)
    if n == _ERR_SPACE:
        raise InsufficientSpaceError("compressed output exceeded bound")
    if n < 0:
        return None
    return out[:n].tobytes()


def native_inflate(data: bytes, max_out: int):
    """One-shot raw-DEFLATE decode. Returns (bytes, consumed) or None."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8) if data else np.zeros(1, np.uint8)
    out = np.empty(max(max_out, 1), np.uint8)
    consumed = ctypes.c_int64(0)
    n = lib.inflate_c(src.ctypes.data, len(data), out.ctypes.data,
                      max_out, ctypes.byref(consumed))
    if n == _ERR_BADDATA:
        raise BadDataError("invalid DEFLATE stream")
    if n == _ERR_SHORT:
        raise ShortInputError("compressed data truncated")
    if n == _ERR_SPACE:
        raise InsufficientSpaceError("decompressed data exceeds buffer")
    if n < 0:
        return None
    return out[:n].tobytes(), int(consumed.value)


def native_crc32(data: bytes, crc: int = 0) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8) if data else np.zeros(1, np.uint8)
    return int(lib.crc32_c(crc & 0xFFFFFFFF, src.ctypes.data, len(data)))


def native_adler32(data: bytes, adler: int = 1) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8) if data else np.zeros(1, np.uint8)
    return int(lib.adler32_c(adler & 0xFFFFFFFF, src.ctypes.data, len(data)))

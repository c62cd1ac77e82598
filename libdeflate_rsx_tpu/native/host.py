"""Python bindings for the native host codec (native/codec.c).

Two tiers: a CPython C-extension (native/pymod.c, ~100 ns/call,
releases the GIL on large buffers — the host thread-pool layer depends
on that) and a ctypes fallback. Each function returns None when no
native library is available so callers can fall back to the pure-Python
engine — the same graceful degradation the reference applies to its
CUDA path (reference src/batch.rs:23-27).
"""

from __future__ import annotations

import ctypes

from . import get_ext, get_lib
from ..utils.errors import (
    BadDataError,
    InsufficientSpaceError,
    ShortInputError,
)

_ERR_BADDATA = -1
_ERR_SPACE = -2
_ERR_SHORT = -3

_HASH_SIZE = 1 << 16

_FLUSH_SYNC = 1
_FLUSH_FINISH = 2


def native_available() -> bool:
    return get_ext() is not None or get_lib() is not None


def native_deflate(data: bytes, level: int, flush: int,
                   history: bytes = b"") -> bytes | None:
    """Raw DEFLATE of `data` (with LZ history), levels 1-12.
    flush: 1 = SYNC, 2 = FINISH. None => no native library."""
    if not (1 <= level <= 12):
        return None
    ext = get_ext()
    if ext is not None:
        if history:
            out = ext.deflate(data, level, flush, history)
        else:
            out = ext.deflate(data, level, flush)
        if isinstance(out, int):
            if out == _ERR_SPACE:
                raise InsufficientSpaceError(
                    "compressed output exceeded bound")
            return None
        return out
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np
    buf = history + data if history else data
    total = len(buf)
    cap = total + (total >> 3) + 4096
    out = np.empty(cap, np.uint8)
    src = np.frombuffer(buf, np.uint8) if total else np.zeros(1, np.uint8)
    work = np.zeros(2 * _HASH_SIZE + total, np.int32)
    n = lib.deflate_c(src.ctypes.data, len(history), total, level, flush,
                      out.ctypes.data, cap, work.ctypes.data)
    if n == _ERR_SPACE:
        raise InsufficientSpaceError("compressed output exceeded bound")
    if n < 0:
        return None
    return out[:n].tobytes()


def _map_inflate_err(n: int) -> None:
    if n == _ERR_BADDATA:
        raise BadDataError("invalid DEFLATE stream")
    if n == _ERR_SHORT:
        raise ShortInputError("compressed data truncated")
    if n == _ERR_SPACE:
        raise InsufficientSpaceError("decompressed data exceeds buffer")


def native_deflate_bits(data: bytes, level: int, mode: int,
                        history: bytes = b"", phase: int = 0):
    """Bit-exact raw DEFLATE for the incremental Deflater (the
    reference's FlushMode::None, reference src/compress/mod.rs:424-429):
    the stream starts at bit `phase` (0..7) of its first output byte and
    mode 0 (NONE) / 3 (FINISH-bits) return the total BIT length with no
    byte-alignment padding.

    Returns (out_array, total_bits_including_phase) — for modes 1/2 the
    bit count is 8 * byte count. None when no native library."""
    if not (1 <= level <= 12):
        return None
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np
    buf = history + data if history else data
    total = len(buf)
    cap = total + (total >> 3) + 4096
    out = np.zeros(cap, np.uint8)
    src = np.frombuffer(buf, np.uint8) if total else np.zeros(1, np.uint8)
    work = np.zeros(2 * _HASH_SIZE + total, np.int32)
    r = lib.deflate_c(src.ctypes.data, len(history), total, level,
                      mode | ((phase & 7) << 4), out.ctypes.data, cap,
                      work.ctypes.data)
    if r == _ERR_SPACE:
        raise InsufficientSpaceError("compressed output exceeded bound")
    if r < 0:
        return None
    bits = int(r) if mode in (0, 3) else int(r) * 8
    return out, bits


def native_inflate(data: bytes, max_out: int):
    """One-shot raw-DEFLATE decode. Returns (bytes, consumed) or None."""
    ext = get_ext()
    if ext is not None:
        res = ext.inflate(data, max_out)
        if isinstance(res, int):
            _map_inflate_err(res)
            return None
        return res
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np
    src = np.frombuffer(data, np.uint8) if data else np.zeros(1, np.uint8)
    out = np.empty(max(max_out, 1), np.uint8)
    consumed = ctypes.c_int64(0)
    n = lib.inflate_c(src.ctypes.data, len(data), out.ctypes.data,
                      max_out, ctypes.byref(consumed))
    if n < 0:
        _map_inflate_err(n)
        return None
    return out[:n].tobytes(), int(consumed.value)


def native_crc32(data: bytes, crc: int = 0) -> int | None:
    ext = get_ext()
    if ext is not None:
        return ext.crc32(data, crc)
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np
    src = np.frombuffer(data, np.uint8) if data else np.zeros(1, np.uint8)
    return int(lib.crc32_c(crc & 0xFFFFFFFF, src.ctypes.data, len(data)))


def native_adler32(data: bytes, adler: int = 1) -> int | None:
    ext = get_ext()
    if ext is not None:
        return ext.adler32(data, adler)
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np
    src = np.frombuffer(data, np.uint8) if data else np.zeros(1, np.uint8)
    return int(lib.adler32_c(adler & 0xFFFFFFFF, src.ctypes.data, len(data)))


def native_resolve_tokens(tokens, out_cap: int) -> bytes | None:
    """Pass-2 LZ resolution of a device token column (ops/tokens.py
    format). Returns the decoded bytes, None if the tokens are invalid,
    or raises LookupError when no native library exists (callers use
    the numpy resolver)."""
    ext = get_ext()
    if ext is not None:
        return ext.resolve_tokens(tokens, out_cap)
    raise LookupError("no native resolver")


class CInflater:
    """Native resumable streaming decoder (codec.c icx_*), presenting
    the same step() protocol as models/portable/inflate.Inflater so
    DeflateDecoder can use it for non-seekable readers at native speed.
    Raises LookupError at construction when no native library exists."""

    def __init__(self) -> None:
        import numpy as np

        lib = get_lib()
        if lib is None:
            raise LookupError("no native library")
        self._lib = lib
        self._ctx = np.zeros(int(lib.icx_size()), np.uint8)
        lib.icx_init(self._ctx.ctypes.data)
        self._done = False

    @property
    def finished(self) -> bool:
        return self._done

    def step(self, data: bytes, out: bytearray, max_out: int):
        """Consume from `data`, append to `out` (never past max_out
        total). Returns (DecompressStatus, bytes_consumed)."""
        import numpy as np

        from ..utils.errors import BadDataError, DecompressStatus

        room = max(max_out - len(out), 0)
        buf = np.empty(max(room, 1), np.uint8)
        src = np.frombuffer(data, np.uint8) if data else \
            np.zeros(1, np.uint8)
        in_used = ctypes.c_int64(0)
        out_written = ctypes.c_int64(0)
        rc = self._lib.icx_step(
            self._ctx.ctypes.data, src.ctypes.data, len(data),
            buf.ctypes.data, room,
            ctypes.byref(in_used), ctypes.byref(out_written))
        out += buf[: int(out_written.value)].tobytes()
        if rc < 0:
            raise BadDataError("invalid DEFLATE stream")
        if rc == 0:
            self._done = True
            return DecompressStatus.DONE, int(in_used.value)
        if rc == 2:
            return DecompressStatus.INSUFFICIENT_SPACE, int(in_used.value)
        return DecompressStatus.SHORT_INPUT, int(in_used.value)

"""Host-engine dispatch: native C codec when available, pure-Python
reference engine otherwise.

The reference's host path is a single native implementation; this build
keeps two tiers — native/codec.c for speed, models/portable/ as the
bit-exact reference and fallback (also the streaming/resumable engine) —
selected here. Level 0 always uses the Python engine (stored blocks).
"""

from __future__ import annotations

from .models.portable.deflate import Flush, deflate_host
from .models.portable.inflate import Inflater
from .utils.errors import (
    DecompressStatus,
    InsufficientSpaceError,
    ShortInputError,
)

_FLUSH_CODE = {Flush.SYNC: 1, Flush.FINISH: 2}

# intra-buffer parallel chunking, the reference's >256 KiB scheme
# (reference src/compress/mod.rs:699-772) with history carried across
# chunk boundaries (see parallel/hostpool.py)
CHUNK_PARALLEL_SIZE = 256 * 1024
from .common import WINDOW_SIZE as _WINDOW


def _compress_one_chunk(args) -> bytes:
    data, level, flush_code, history = args
    from .native.host import native_deflate
    out = native_deflate(data, level, flush_code, history)
    if out is not None:
        return out
    flush = Flush.SYNC if flush_code == 1 else Flush.FINISH
    return deflate_host(data, level, flush, history=history)


def compress_raw(data: bytes, level: int, flush: Flush = Flush.FINISH,
                 history: bytes = b"") -> bytes:
    """Raw DEFLATE at any level, native fast path for 1-12; inputs over
    256 KiB compress as parallel SYNC-joined chunks on the host pool."""
    n = len(data)
    if 1 <= level <= 12 and n > 0:
        if n > CHUNK_PARALLEL_SIZE:
            from .parallel.hostpool import pmap, pool_width
            if pool_width() > 1:
                jobs = []
                pos = 0
                while pos < n:
                    end = min(pos + CHUNK_PARALLEL_SIZE, n)
                    hist = history if pos == 0 \
                        else data[max(0, pos - _WINDOW):pos]
                    code = _FLUSH_CODE[flush] if end == n else 1
                    jobs.append((data[pos:end], level, code, hist))
                    pos = end
                return b"".join(pmap(_compress_one_chunk, jobs))
        from .native.host import native_deflate
        out = native_deflate(data, level, _FLUSH_CODE[flush], history)
        if out is not None:
            return out
    return deflate_host(data, level, flush, history=history)


def decompress_raw(data: bytes, max_out: int):
    """One-shot raw DEFLATE decode -> (bytes, consumed)."""
    from .native.host import native_inflate
    res = native_inflate(data, max_out)
    if res is not None:
        return res
    d = Inflater()
    out = bytearray()
    status, consumed = d.step(data, out, max_out)
    if status == DecompressStatus.SHORT_INPUT:
        raise ShortInputError("compressed data truncated")
    if status == DecompressStatus.INSUFFICIENT_SPACE:
        raise InsufficientSpaceError("decompressed data exceeds buffer")
    return bytes(out), consumed


def crc32(data: bytes, crc: int = 0) -> int:
    from .native.host import native_crc32
    v = native_crc32(data, crc)
    if v is not None:
        return v
    from .models.portable.checksums import crc32_host
    return crc32_host(data, crc)


def adler32(data: bytes, adler: int = 1) -> int:
    from .native.host import native_adler32
    v = native_adler32(data, adler)
    if v is not None:
        return v
    from .models.portable.checksums import adler32_host
    return adler32_host(data, adler)

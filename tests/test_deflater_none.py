"""Encoder-side Flush.NONE: bit-level resumable compression across
calls (reference src/compress/mod.rs:424-429,604-691 FlushMode::None).
The concatenation of every compress() return must be one valid DEFLATE
stream; intermediate calls may end mid-byte (pending_bits != 0)."""

import zlib

import numpy as np
import pytest

from libdeflate_rsx_tpu import Deflater
from libdeflate_rsx_tpu.models.portable.deflate import Flush


def _parts(seed=3):
    rng = np.random.default_rng(seed)
    return [bytes(rng.integers(65, 91, n, dtype=np.uint8))
            for n in (5000, 1, 37, 70000, 999)]


@pytest.mark.parametrize("level", [1, 4, 6, 9, 10, 12])
def test_none_flush_roundtrip_bit_level(level):
    parts = _parts()
    d = Deflater(level)
    out = b""
    pend = []
    for p in parts[:-1]:
        out += d.compress(p)
        pend.append(d.pending_bits)
    out += d.compress(parts[-1], Flush.FINISH)
    assert d.finished
    assert zlib.decompress(out, -15) == b"".join(parts)
    # bit-level contract: at least one boundary lands mid-byte (with
    # these payloads every level does; a full byte-aligned run would
    # mean NONE degraded to SYNC)
    assert any(b != 0 for b in pend), pend


def test_none_beats_sync_joins():
    from libdeflate_rsx_tpu import engine as eng
    parts = _parts(7)
    d = Deflater(6)
    out = b"".join([d.compress(p) for p in parts[:-1]]
                   + [d.compress(parts[-1], Flush.FINISH)])
    joined = b""
    hist = b""
    for i, p in enumerate(parts):
        fl = Flush.FINISH if i == len(parts) - 1 else Flush.SYNC
        joined += eng.compress_raw(p, 6, fl, history=hist)
        hist = (hist + p)[-32768:]
    assert zlib.decompress(out, -15) == zlib.decompress(joined, -15)
    assert len(out) < len(joined)


def test_sync_from_bit_phase_realigns():
    d = Deflater(6)
    a, b, c = b"abcabcabcabc" * 100, b"hello world " * 50, b"tail" * 500
    out = d.compress(a)
    out += d.compress(b, Flush.SYNC)
    assert d.pending_bits == 0
    out += d.compress(c, Flush.FINISH)
    assert zlib.decompress(out, -15) == a + b + c


def test_incompressible_stored_blocks_from_phase():
    """Stored blocks must stay byte-aligned relative to the REAL stream
    even when a block starts at a bit phase (the writer is phase-aware;
    a post-shift design would corrupt them)."""
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, 300000, dtype=np.uint8).tobytes()
    d = Deflater(6)
    out = d.compress(b"text " * 500)          # leaves a bit phase
    out += d.compress(noise)                   # stored blocks inside
    out += d.compress(b"end", Flush.FINISH)
    assert zlib.decompress(out, -15) == b"text " * 500 + noise + b"end"


def test_empty_finish_and_errors():
    d = Deflater(6)
    assert zlib.decompress(d.compress(b"", Flush.FINISH), -15) == b""
    with pytest.raises(ValueError):
        d.compress(b"x")
    from libdeflate_rsx_tpu.utils.errors import LevelError
    with pytest.raises(LevelError):
        Deflater(13)


def test_level0_degrades_to_aligned():
    d = Deflater(0)
    out = d.compress(b"abc" * 100) + d.compress(b"xyz", Flush.FINISH)
    assert zlib.decompress(out, -15) == b"abc" * 100 + b"xyz"

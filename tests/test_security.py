"""Security and robustness tests (reference tests/security_limit.rs,
security_oom.rs, security_overlap_test.rs, security_state_reset.rs
parity): zip-bomb guards, allocation caps, overlap rejection for all six
`_into` APIs, decoder state reset between streaming and one-shot use."""

import zlib

import numpy as np
import pytest

from conftest import make_corpus
from libdeflate_rsx_tpu import Compressor, Decompressor
from libdeflate_rsx_tpu.utils.errors import (
    BadDataError,
    InsufficientSpaceError,
    LevelError,
    LimitExceededError,
    OverlapError,
    ShortInputError,
)


def bomb(n_zeros: int) -> bytes:
    """Highly-expanding zlib stream of n zeros (raw deflate)."""
    return zlib.compress(b"\x00" * n_zeros, 9)[2:-4]


def test_ratio_guard_default():
    comp = bomb(50_000_000)  # ~48 KB compressed -> 50 MB output
    d = Decompressor()
    with pytest.raises(LimitExceededError):
        d.decompress_deflate(comp, 50_000_000 * 3)


def test_ratio_guard_respects_input_size():
    # modest expansion passes: ratio < 2000
    data = make_corpus("pattern", 100_000)
    comp = Compressor(6).compress_deflate(data)
    assert Decompressor().decompress_deflate(comp, len(data)) == data


def test_ratio_guard_bypass_with_large_input_rejected():
    # reference tests a bypass attempt: big input should not unlock a
    # disproportionate output (reference tests/security_limit.rs:20-39)
    comp = bomb(200_000_000)
    d = Decompressor()
    d.set_limit_ratio(100)
    with pytest.raises(LimitExceededError):
        d.decompress_deflate(comp, 200_000_000)


def test_memory_cap():
    data = make_corpus("text", 100_000)
    comp = Compressor(6).compress_deflate(data)
    d = Decompressor()
    d.set_max_memory_limit(1000)
    with pytest.raises(LimitExceededError):
        d.decompress_deflate(comp, len(data))
    d.set_max_memory_limit(None)
    assert d.decompress_deflate(comp, len(data)) == data


def test_huge_allocation_errors_not_crashes():
    # 8 GB declared output must raise, not OOM-kill (reference
    # tests/security_oom.rs)
    d = Decompressor()
    with pytest.raises(LimitExceededError):
        d.decompress_deflate(b"\x00" * 100, 8 << 30)


def test_level_range():
    with pytest.raises(LevelError):
        Compressor(13)
    with pytest.raises(LevelError):
        Compressor(-1)
    Compressor(0)
    Compressor(12)


@pytest.mark.parametrize("method", [
    "compress_deflate_into", "compress_zlib_into", "compress_gzip_into"])
def test_compress_overlap_rejected(method):
    buf = np.zeros(4096, np.uint8)
    buf[:1000] = np.frombuffer(make_corpus("text", 1000), np.uint8)
    src = memoryview(buf)[:1000]
    dst = memoryview(buf)[500:4000]
    with pytest.raises(OverlapError):
        getattr(Compressor(6), method)(src, dst)


@pytest.mark.parametrize("method", [
    "decompress_deflate_into", "decompress_zlib_into",
    "decompress_gzip_into"])
def test_decompress_overlap_rejected(method):
    data = make_corpus("text", 1000)
    comp = {"decompress_deflate_into": Compressor(6).compress_deflate,
            "decompress_zlib_into": Compressor(6).compress_zlib,
            "decompress_gzip_into": Compressor(6).compress_gzip}[method](data)
    buf = np.zeros(8192, np.uint8)
    buf[:len(comp)] = np.frombuffer(comp, np.uint8)
    src = memoryview(buf)[:len(comp)]
    dst = memoryview(buf)[100:5000]
    with pytest.raises(OverlapError):
        getattr(Decompressor(), method)(src, dst)


def test_into_disjoint_buffers_ok():
    data = make_corpus("text", 1000)
    out = bytearray(4096)
    n = Compressor(6).compress_deflate_into(data, out)
    back = bytearray(2000)
    m = Decompressor().decompress_deflate_into(bytes(out[:n]), back)
    assert bytes(back[:m]) == data


def test_into_undersized_output():
    data = make_corpus("random", 10000)
    out = bytearray(16)
    with pytest.raises(InsufficientSpaceError):
        Compressor(6).compress_deflate_into(data, out)


def test_decoder_state_reset_between_uses():
    """A decode failure must not poison later use of the SAME instance
    (reference tests/security_state_reset.rs + reuse_decompressor.rs —
    the reference reuses the poisoned object, so do we)."""
    import io
    from libdeflate_rsx_tpu.stream import DeflateDecoder

    data1 = make_corpus("text", 50000, seed=1)
    comp1 = zlib.compress(data1, 6)[2:-4]
    # interrupted streaming decode
    dec = DeflateDecoder(io.BytesIO(comp1[: len(comp1) // 2]))
    with pytest.raises(ShortInputError):
        dec.read()
    # one-shot: poison the SAME Decompressor with a truncated stream,
    # then decode valid data with it
    data2 = make_corpus("pattern", 30000, seed=2)
    comp2 = Compressor(6).compress_deflate(data2)
    d = Decompressor()
    with pytest.raises(ShortInputError):
        d.decompress_deflate(comp2[: len(comp2) // 2], len(data2))
    assert d.decompress_deflate(comp2, len(data2)) == data2
    # and with garbage (BadData) in between
    with pytest.raises(BadDataError):
        d.decompress_deflate(b"\x07\x00\x00\x00", 100)
    assert d.decompress_deflate(comp2, len(data2)) == data2
    # gzip/zlib containers on the same instance too
    gz = Compressor(6).compress_gzip(data2)
    with pytest.raises((ShortInputError, BadDataError)):
        d.decompress_gzip(gz[: len(gz) // 2], len(data2))
    assert d.decompress_gzip(gz, len(data2)) == data2


def test_truncated_and_garbage_inputs():
    d = Decompressor()
    data = make_corpus("text", 10000)
    comp = Compressor(6).compress_deflate(data)
    with pytest.raises(ShortInputError):
        d.decompress_deflate(comp[:10], len(data))
    with pytest.raises(BadDataError):
        # BTYPE=3 reserved
        d.decompress_deflate(b"\x07\x00\x00\x00", 100)


def test_gzip_reserved_flag_rejected():
    data = make_corpus("text", 1000)
    comp = bytearray(Compressor(6).compress_gzip(data))
    comp[3] |= 0xE0  # reserved FLG bits
    with pytest.raises(BadDataError):
        Decompressor().decompress_gzip(bytes(comp), 2000)


def test_zlib_header_checks():
    data = make_corpus("text", 1000)
    comp = bytearray(Compressor(6).compress_zlib(data))
    comp[1] ^= 0x01  # break FCHECK
    with pytest.raises(BadDataError):
        Decompressor().decompress_zlib(bytes(comp), 2000)


def test_checksum_verification():
    data = make_corpus("text", 5000)
    gz = bytearray(Compressor(6).compress_gzip(data))
    gz[-5] ^= 0xFF  # corrupt CRC
    with pytest.raises(BadDataError):
        Decompressor().decompress_gzip(bytes(gz), 10000)
    zz = bytearray(Compressor(6).compress_zlib(data))
    zz[-1] ^= 0xFF  # corrupt Adler
    with pytest.raises(BadDataError):
        Decompressor().decompress_zlib(bytes(zz), 10000)


def test_exact_fit_output_buffers():
    """_into variants with output buffers sized EXACTLY to the result
    must succeed; one byte smaller must raise (the reference's bitstream
    boundary tests, reference tests/bitstream_boundary.rs, re-expressed
    at the API layer)."""
    data = make_corpus("text", 5000)
    c = Compressor(6)
    need = len(c.compress_deflate(data))
    out = bytearray(need)
    assert c.compress_deflate_into(data, out) == need
    assert Decompressor().decompress_deflate(bytes(out), len(data)) == data
    with pytest.raises(InsufficientSpaceError):
        c.compress_deflate_into(data, bytearray(need - 1))
    # decode into an exact-fit buffer
    exact = bytearray(len(data))
    n = Decompressor().decompress_deflate_into(bytes(out), exact)
    assert n == len(data) and bytes(exact) == data
    with pytest.raises(InsufficientSpaceError):
        Decompressor().decompress_deflate_into(
            bytes(out), bytearray(len(data) - 1))

"""Checksum oracle tests: differential vs CPython zlib (the analog of the
reference's differential tests vs libdeflater, reference
tests/unit_tests.rs:352-368 and tests/adler32_*.rs)."""

import zlib

import pytest

from libdeflate_rsx_tpu import adler32, crc32
from libdeflate_rsx_tpu.ops.checksum_math import adler32_combine, crc32_combine
from tests.conftest import make_corpus


@pytest.mark.parametrize("size", [0, 1, 2, 7, 63, 255, 1035, 4095, 4096,
                                  5552, 6000, 65536, 1 << 20])
@pytest.mark.parametrize("kind", ["pattern", "random", "zeros"])
def test_crc32_matches_zlib(kind, size):
    data = make_corpus(kind, size)
    assert crc32(data) == zlib.crc32(data)


@pytest.mark.parametrize("size", [0, 1, 2, 7, 63, 255, 1035, 4095, 4096,
                                  5552, 6000, 65536, 1 << 20])
@pytest.mark.parametrize("kind", ["pattern", "random", "zeros"])
def test_adler32_matches_zlib(kind, size):
    data = make_corpus(kind, size)
    assert adler32(data) == zlib.adler32(data)


def test_crc32_running_updates():
    data = make_corpus("text", 10000)
    c = 0
    for i in range(0, len(data), 997):
        c = crc32(data[i:i + 997], c)
    assert c == zlib.crc32(data)


def test_adler32_running_updates():
    data = make_corpus("text", 10000)
    a = 1
    for i in range(0, len(data), 997):
        a = adler32(data[i:i + 997], a)
    assert a == zlib.adler32(data)


def test_adler32_overflow_ff_fill():
    """0xFF fills stress the modular reduction (reference
    tests/adler32_overflow.rs)."""
    for size in (5551, 5552, 5553, 100000, 1 << 20):
        data = b"\xff" * size
        assert adler32(data) == zlib.adler32(data)


@pytest.mark.parametrize("split", [0, 1, 100, 4096, 9999])
def test_crc32_combine(split):
    data = make_corpus("text", 10000)
    a, b = data[:split], data[split:]
    combined = crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b))
    assert combined == zlib.crc32(data)


@pytest.mark.parametrize("split", [0, 1, 100, 4096, 9999])
def test_adler32_combine(split):
    data = make_corpus("text", 10000)
    a, b = data[:split], data[split:]
    combined = adler32_combine(zlib.adler32(a), zlib.adler32(b), len(b))
    assert combined == zlib.adler32(data)


def test_crc32_golden():
    # well-known vector
    assert crc32(b"123456789") == 0xCBF43926
    assert adler32(b"123456789") == 0x091E01DE


def test_checksum_tail_sizes():
    """Every tail length 0..130 (pins lane/tail handling like the
    reference's tail sweeps)."""
    base = make_corpus("random", 8192)
    for n in range(131):
        d = base[:4096 + n]
        assert crc32(d) == zlib.crc32(d), n
        assert adler32(d) == zlib.adler32(d), n

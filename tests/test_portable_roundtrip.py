"""Host-engine round-trip and differential tests vs CPython zlib.

The analog of the reference's tests/unit_tests.rs round trips: our encoder's
output must be decodable by zlib (wire-format validity), zlib's output must
be decodable by our decoder (decoder completeness), and our own round trip
must be byte-exact at every level.
"""

import zlib

import pytest

from libdeflate_rsx_tpu import Compressor, Decompressor
from libdeflate_rsx_tpu.models.portable.deflate import Flush, deflate_host
from tests.conftest import make_corpus

CORPORA = [
    ("text", 20000),
    ("pattern", 20000),
    ("random", 5000),
    ("zeros", 30000),
    ("periodic:7", 8000),
    ("text", 1),
    ("text", 0),
]


def zlib_raw_decompress(data: bytes) -> bytes:
    return zlib.decompress(data, wbits=-15)


def zlib_raw_compress(data: bytes, level: int) -> bytes:
    c = zlib.compressobj(level=level, wbits=-15)
    return c.compress(data) + c.flush()


@pytest.mark.parametrize("level", [0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
@pytest.mark.parametrize("kind,size", CORPORA)
def test_our_deflate_decodable_by_zlib(level, kind, size):
    data = make_corpus(kind, size)
    comp = deflate_host(data, level)
    assert zlib_raw_decompress(comp) == data


@pytest.mark.parametrize("level", [10, 11, 12])
@pytest.mark.parametrize("kind,size", [("text", 8000), ("pattern", 8000),
                                       ("zeros", 8000), ("random", 2000)])
def test_optimal_levels_decodable_by_zlib(level, kind, size):
    data = make_corpus(kind, size)
    comp = deflate_host(data, level)
    assert zlib_raw_decompress(comp) == data


@pytest.mark.parametrize("level", [0, 1, 6, 9])
@pytest.mark.parametrize("kind,size", CORPORA)
def test_zlib_output_decodable_by_us(level, kind, size):
    data = make_corpus(kind, size)
    comp = zlib_raw_compress(data, min(level, 9))
    d = Decompressor()
    assert d.decompress_deflate(comp, max_out=len(data) + 16) == data


@pytest.mark.parametrize("level", [0, 1, 3, 6, 9, 10, 12])
def test_own_roundtrip_all_formats(level):
    data = make_corpus("text", 6000)
    c = Compressor(level)
    d = Decompressor()
    assert d.decompress_deflate(c.compress_deflate(data), len(data) + 16) == data
    assert d.decompress_zlib(c.compress_zlib(data), len(data) + 16) == data
    assert d.decompress_gzip(c.compress_gzip(data), len(data) + 16) == data


@pytest.mark.parametrize("level", [1, 6, 9])
def test_zlib_container_interop(level):
    """Our zlib container decodable by zlib module and vice versa."""
    data = make_corpus("text", 9000)
    ours = Compressor(level).compress_zlib(data)
    assert zlib.decompress(ours) == data
    theirs = zlib.compress(data, level)
    assert Decompressor().decompress_zlib(theirs, len(data) + 16) == data


@pytest.mark.parametrize("level", [1, 6])
def test_gzip_container_interop(level):
    import gzip as gzip_mod
    data = make_corpus("text", 9000)
    ours = Compressor(level).compress_gzip(data)
    assert gzip_mod.decompress(ours) == data
    theirs = gzip_mod.compress(data, level)
    assert Decompressor().decompress_gzip(theirs, len(data) + 32) == data


def test_level_monotonic_ratio():
    """Higher levels should not compress dramatically worse (reference
    tests/unit_tests.rs:111-125 level monotonicity)."""
    data = make_corpus("text", 30000)
    sizes = {lv: len(deflate_host(data, lv)) for lv in (1, 6, 9, 12)}
    assert sizes[6] <= sizes[1]
    assert sizes[9] <= sizes[6] * 1.02
    assert sizes[12] <= sizes[9] * 1.02


def test_ratio_vs_zlib_level6():
    """Compressed size should be competitive with zlib at level 6
    (BASELINE.md bar: ratio >= libdeflate level-6; zlib is the floor)."""
    data = make_corpus("text", 50000)
    ours = len(deflate_host(data, 6))
    theirs = len(zlib_raw_compress(data, 6))
    assert ours <= theirs * 1.05, (ours, theirs)


def test_sync_flush_concatenation():
    """SYNC-flushed chunks byte-concatenate into one valid stream (the
    parallel-chunk join, reference src/compress/mod.rs:662-681)."""
    a = make_corpus("text", 7000, seed=1)
    b = make_corpus("text", 7000, seed=2)
    part1 = deflate_host(a, 6, Flush.SYNC)
    part2 = deflate_host(b, 6, Flush.FINISH)
    assert zlib_raw_decompress(part1 + part2) == a + b


def test_history_dictionary_carryover():
    """Second chunk may back-reference the first via history=..."""
    base = make_corpus("text", 4000, seed=3)
    part1 = deflate_host(base, 6, Flush.SYNC)
    part2 = deflate_host(base, 6, Flush.FINISH, history=base)
    joined = part1 + part2
    assert zlib_raw_decompress(joined) == base + base
    # dictionary must actually help: chunk 2 should be much smaller
    independent = deflate_host(base, 6, Flush.FINISH)
    assert len(part2) < len(independent) * 0.8


def test_empty_input_all_levels():
    for level in (0, 1, 6, 12):
        comp = deflate_host(b"", level)
        assert zlib_raw_decompress(comp) == b""


def test_incompressible_expansion_bounded():
    from libdeflate_rsx_tpu import deflate_compress_bound
    data = make_corpus("random", 100000)
    comp = deflate_host(data, 6)
    assert len(comp) <= deflate_compress_bound(len(data))
    assert zlib_raw_decompress(comp) == data

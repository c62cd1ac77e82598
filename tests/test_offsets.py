"""Per-offset LZ copy tests (reference tests/offset_tests.rs parity: one
round trip per match offset 1..64, plus key larger offsets).

The reference pins ~50 specialized SSSE3 copy kernels with these; here
they pin (a) the decoder's pattern-broadcast overlapping-copy path for
every small offset and (b) the encoder's match emission at each distance
— for both the host engine and the device encoder."""

import zlib

import pytest

from conftest import make_corpus
from libdeflate_rsx_tpu import Compressor, Decompressor


def periodic(period: int, size: int = 8192) -> bytes:
    base = bytes((37 * i + 11) % 256 for i in range(period))
    return (base * (size // period + 1))[:size]


@pytest.mark.parametrize("offset", list(range(1, 65)))
def test_host_roundtrip_each_offset(offset):
    data = periodic(offset)
    comp = Compressor(6).compress_deflate(data)
    assert Decompressor().decompress_deflate(comp, len(data)) == data


@pytest.mark.parametrize("offset", [1, 2, 3, 4, 5, 7, 8, 13, 16, 31, 32, 64])
def test_decoder_handles_zlib_overlapping_copies(offset):
    """zlib-produced streams with dist<len overlapping matches must decode
    byte-exactly (the prepare_pattern analog, reference
    src/decompress/mod.rs:1258-1317)."""
    data = periodic(offset, 65536)
    comp = zlib.compress(data, 9)[2:-4]
    assert Decompressor().decompress_deflate(comp, len(data)) == data


@pytest.mark.parametrize("offset", [1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64,
                                    100, 255, 4096])
def test_device_encoder_each_offset(offset):
    data = periodic(offset, 32768)
    from libdeflate_rsx_tpu.models.greedy_static import deflate_device_static
    comp = deflate_device_static(data)
    assert zlib.decompress(comp, -15) == data


@pytest.mark.parametrize("offset", [3, 5, 9, 17, 33])
def test_offset_with_broken_matches(offset):
    """Periodic data with literal interruptions (the reference's
    small-match corpus variant, scripts/gen_bench_files.py)."""
    data = bytearray(periodic(offset, 16384))
    for i in range(200, len(data), 731):
        data[i] ^= 0xA5
    data = bytes(data)
    comp = Compressor(9).compress_deflate(data)
    assert Decompressor().decompress_deflate(comp, len(data)) == data

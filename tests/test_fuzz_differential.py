"""Randomized differential testing across all engines and the zlib oracle
(the reference's differential-oracle pattern, SURVEY.md §4: libdeflater
there, CPython zlib here).

Every seed produces a structured random corpus (mixed literals, runs,
repeats at random distances, boundary sizes); each buffer must round-trip
through every compression tier and decode identically via (a) our host
decoder, (b) CPython zlib, and (c) cross-engine (zlib-compressed -> our
decoder)."""

import random
import zlib

import pytest

from libdeflate_rsx_tpu import Compressor, Decompressor
from libdeflate_rsx_tpu.engine import compress_raw, decompress_raw
from libdeflate_rsx_tpu.models.portable.deflate import Flush, deflate_host


def structured_random(seed: int, size: int) -> bytes:
    """Adversarial-ish generator: interleaves literal noise, byte runs,
    and copies of earlier content at random distances."""
    r = random.Random(seed)
    out = bytearray()
    while len(out) < size:
        k = r.random()
        if k < 0.3 or len(out) < 4:
            out += bytes(r.randrange(256) for _ in range(r.randrange(1, 40)))
        elif k < 0.5:
            out += bytes([r.randrange(256)]) * r.randrange(3, 300)
        else:
            dist = r.randrange(1, min(len(out), 32768) + 1)
            ln = r.randrange(3, 300)
            start = len(out) - dist
            for i in range(ln):
                out.append(out[start + i])
    return bytes(out[:size])


@pytest.mark.parametrize("seed", range(8))
def test_all_levels_roundtrip_and_oracle(seed):
    size = random.Random(seed * 7 + 1).choice(
        [1, 13, 255, 256, 257, 4095, 65535, 65536, 65537, 100000])
    data = structured_random(seed, size)
    d = Decompressor()
    for level in (0, 1, 2, 5, 6, 9, 10, 12):
        comp = Compressor(level).compress_deflate(data)
        # zlib oracle must decode our stream byte-exactly
        assert zlib.decompress(comp, -15) == data, (seed, level)
        # and our decoder must agree
        assert d.decompress_deflate(comp, size + 16) == data, (seed, level)


@pytest.mark.parametrize("seed", range(8))
def test_cross_engine_decode(seed):
    data = structured_random(seed + 100, 50000)
    for zlevel in (1, 6, 9):
        comp = zlib.compress(data, zlevel)[2:-4]
        out, consumed = decompress_raw(comp, len(data) + 16)
        assert out == data
        # python reference engine must agree with the native decoder
        from libdeflate_rsx_tpu.models.portable.inflate import Inflater
        ref = bytearray()
        Inflater().step(comp, ref, len(data) + 16)
        assert bytes(ref) == data


@pytest.mark.parametrize("seed", range(4))
def test_native_vs_python_engine_streams_both_decode(seed):
    """The two encoders produce different (both valid) streams; the
    oracle must accept each."""
    data = structured_random(seed + 200, 30000)
    for level in (1, 6, 9):
        native = compress_raw(data, level, Flush.FINISH)
        python = deflate_host(data, level, Flush.FINISH)
        assert zlib.decompress(native, -15) == data
        assert zlib.decompress(python, -15) == data


@pytest.mark.parametrize("seed", range(6))
def test_sync_join_chains(seed):
    """Random chunk chains joined with SYNC flushes must concatenate into
    one valid stream (the parallel-chunk join invariant)."""
    r = random.Random(seed + 300)
    chunks = [structured_random(seed * 31 + i, r.randrange(1, 30000))
              for i in range(4)]
    stream = b""
    history = b""
    for i, c in enumerate(chunks):
        last = i == len(chunks) - 1
        stream += compress_raw(c, 6, Flush.FINISH if last else Flush.SYNC,
                               history=history)
        history = (history + c)[-32768:]
    assert zlib.decompress(stream, -15) == b"".join(chunks)


@pytest.mark.parametrize("seed", range(4))
def test_garbage_never_crashes(seed):
    """Random garbage and truncations must raise typed errors, never
    crash or hang (the reference's adversarial-input pattern)."""
    from libdeflate_rsx_tpu.utils.errors import DeflateError

    r = random.Random(seed + 400)
    d = Decompressor()
    for _ in range(50):
        garbage = bytes(r.randrange(256) for _ in range(r.randrange(0, 300)))
        try:
            d.decompress_deflate(garbage, 1 << 16)
        except DeflateError:
            pass
    # bit-flips in valid streams
    data = structured_random(seed, 5000)
    comp = bytearray(Compressor(6).compress_deflate(data))
    for _ in range(30):
        i = r.randrange(len(comp))
        comp[i] ^= 1 << r.randrange(8)
        try:
            d.decompress_deflate(bytes(comp), len(data) * 3 + 4096)
        except DeflateError:
            pass
        comp[i] ^= 0  # keep mutating cumulatively


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_device_dynamic_tier(seed):
    """Structured-random buffers through the device dynamic-Huffman tier
    (per-block tables, split match tokens, host header build) must
    decode byte-exactly via the zlib oracle AND our host decoder."""
    from libdeflate_rsx_tpu.models.greedy_dynamic import (
        deflate_device_dynamic)

    r = random.Random(seed * 31 + 7)
    size = r.choice([1, 37, 4096, 65535, 65536, 65537, 150000])
    data = structured_random(seed, size)
    comp = deflate_device_dynamic(data)
    assert zlib.decompress(comp, -15) == data
    assert decompress_raw(comp, size + 16)[0] == data

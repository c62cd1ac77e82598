"""Host thread-pool layer (parallel/hostpool.py) — the rayon analog.

Forces a 4-worker pool via LIBDEFLATE_RSX_THREADS regardless of the
machine's core count, so the concurrent paths (chunked one-shot, batch,
stream flush) are exercised even on a 1-core CI host — the same spirit
as the reference's size-threshold parallel tests
(reference tests/parallel_test.rs).
"""

import io
import os
import zlib

import pytest

from tests.conftest import make_corpus


@pytest.fixture(autouse=True)
def force_pool(monkeypatch):
    monkeypatch.setenv("LIBDEFLATE_RSX_THREADS", "4")
    yield


def _mixed(size: int) -> bytes:
    a = make_corpus("text", size // 2, seed=11)
    b = make_corpus("pattern", size - len(a), seed=12)
    return a + b


@pytest.mark.parametrize("size", [256 * 1024 + 1, 1 << 20, 5 << 20])
@pytest.mark.parametrize("level", [1, 6, 9])
def test_parallel_chunked_oneshot_roundtrip(size, level):
    from libdeflate_rsx_tpu import Compressor, Decompressor

    data = _mixed(size)
    comp = Compressor(level).compress_deflate(data)
    # oracle: CPython zlib must decode the SYNC-joined stream
    assert zlib.decompress(comp, -15) == data
    assert Decompressor().decompress_deflate(comp, size) == data


def test_parallel_chunking_carries_history():
    """Matches crossing the 256 KiB chunk boundary must still be found
    (the reference resets history per chunk and loses these; we keep
    them — the joined stream must stay smaller than chunk-isolated
    compression of highly redundant data)."""
    from libdeflate_rsx_tpu import Compressor

    base = make_corpus("pattern", 100 * 1024, seed=3)
    data = (base * 40)[: (1 << 20) + 77]   # repeats span chunk borders
    comp = Compressor(6).compress_deflate(data)
    assert zlib.decompress(comp, -15) == data
    # highly repetitive: with history carried the whole thing stays tiny
    assert len(comp) < len(data) // 50


@pytest.mark.parametrize("fmt", ["deflate", "zlib", "gzip"])
def test_parallel_batch_roundtrip(fmt):
    from libdeflate_rsx_tpu.batch import BatchCompressor, BatchDecompressor

    items = [_mixed(s) for s in (0, 100, 4096, 300 * 1024)]
    comp = BatchCompressor(level=6, format=fmt,
                           use_device=False).compress_batch(items)
    back = BatchDecompressor(format=fmt).decompress_batch(
        comp, [max(len(x), 1) for x in items])
    assert back == items


def test_parallel_batch_fault_isolation():
    from libdeflate_rsx_tpu.batch import BatchDecompressor

    good = zlib.compress(b"hello world" * 100, 6)[2:-4]
    out = BatchDecompressor().decompress_batch(
        [good, b"\x07garbage", good[: len(good) // 2], good],
        [2000, 2000, 2000, 2000])
    assert out[0] == b"hello world" * 100
    assert out[1] is None
    assert out[2] is None
    assert out[3] == b"hello world" * 100


def test_parallel_stream_flush_roundtrip():
    from libdeflate_rsx_tpu.stream import DeflateDecoder, DeflateEncoder

    data = _mixed(3 << 20)
    sink = io.BytesIO()
    enc = DeflateEncoder(sink, level=6, buffer_size=1 << 20)
    # irregular write sizes exercise buffer-threshold flushes
    pos = 0
    for step in (700_000, 1_500_000, 900_000, 10**9):
        enc.write(data[pos: pos + step])
        pos += step
        if pos >= len(data):
            break
    enc.finish()
    stream = sink.getvalue()
    assert zlib.decompress(stream, -15) == data
    dec = DeflateDecoder(io.BytesIO(stream))
    assert dec.read() == data


def test_pool_width_env(monkeypatch):
    from libdeflate_rsx_tpu.parallel import hostpool

    monkeypatch.setenv("LIBDEFLATE_RSX_THREADS", "3")
    assert hostpool.pool_width() == 3
    monkeypatch.setenv("LIBDEFLATE_RSX_THREADS", "bogus")
    assert hostpool.pool_width() == (os.cpu_count() or 1)


def test_pmap_propagates_and_orders():
    from libdeflate_rsx_tpu.parallel.hostpool import pmap

    assert pmap(lambda x: x * x, list(range(50))) == [i * i
                                                      for i in range(50)]
    with pytest.raises(ValueError):
        pmap(lambda x: (_ for _ in ()).throw(ValueError("boom")), [1, 2])


def test_batch_of_large_items_no_reentrant_deadlock(monkeypatch):
    """Batch items >256 KiB re-enter the chunked one-shot path from pool
    workers; with pool width <= item count this used to deadlock (every
    worker blocked waiting for inner chunk jobs). Regression for the
    round-2 advisor finding: 2 workers x two 600 KB items must finish."""
    import threading

    monkeypatch.setenv("LIBDEFLATE_RSX_THREADS", "2")
    from libdeflate_rsx_tpu.batch import BatchCompressor
    from libdeflate_rsx_tpu.parallel import hostpool

    # reset the cached pool so the new width takes effect
    items = [_mixed(600 * 1024), _mixed(600 * 1024)]
    result = []

    def run():
        comp = BatchCompressor(level=6, format="deflate",
                               use_device=False).compress_batch(items)
        result.append(comp)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "batch of large items deadlocked the pool"
    for data, comp in zip(items, result[0]):
        assert zlib.decompress(comp, -15) == data

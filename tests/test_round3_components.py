"""Round-3 component coverage: token resolvers, resumable C inflater,
sharded decode, multi-host global container (single-process leg).

The 2-process multi-host leg lives in test_multihost.py; the lockstep
kernel's differential suite in test_inflate_tokens.py.
"""

import random
import zlib

import numpy as np
import pytest

from tests.conftest import make_corpus


# ---------------------------------------------------------- resolvers
def _synthetic_tokens(n_out: int, seed: int):
    from libdeflate_rsx_tpu.ops.tokens import (
        KIND_LIT, KIND_MATCH, KIND_SHIFT)

    r = random.Random(seed)
    toks, out = [], bytearray()
    while len(out) < n_out:
        if out and r.random() < 0.55:
            dist = r.randrange(1, min(len(out), 32768) + 1)
            length = r.randrange(3, 259)
            for _ in range(length):
                out.append(out[-dist])
            toks.append((KIND_MATCH << KIND_SHIFT) | (length - 3)
                        | ((dist - 1) << 8))
        else:
            b = r.randrange(256)
            out.append(b)
            toks.append((KIND_LIT << KIND_SHIFT) | b)
        if r.random() < 0.15:
            toks.append(0)          # NOP stall slots
    return np.asarray(toks, np.int32), bytes(out)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_c_resolver_matches_numpy_oracle(seed):
    from libdeflate_rsx_tpu.native.host import native_resolve_tokens
    from libdeflate_rsx_tpu.ops.tokens import resolve_tokens_np

    toks, expect = _synthetic_tokens(4000, seed)
    cap = len(expect) + 512
    assert resolve_tokens_np(toks, cap) == expect
    assert native_resolve_tokens(toks, cap) == expect


def test_resolver_rejects_bad_tokens():
    from libdeflate_rsx_tpu.native.host import native_resolve_tokens
    from libdeflate_rsx_tpu.ops.tokens import (
        KIND_LIT, KIND_MATCH, KIND_SHIFT, resolve_tokens_np)

    bad_dist = np.asarray(
        [(KIND_MATCH << KIND_SHIFT) | 0 | ((7 - 1) << 8)], np.int32)
    assert resolve_tokens_np(bad_dist, 64) is None
    assert native_resolve_tokens(bad_dist, 64) is None
    overflow = np.asarray([(KIND_LIT << KIND_SHIFT) | 65] * 10, np.int32)
    assert native_resolve_tokens(overflow, 5) is None


# ------------------------------------------------ resumable C inflater
def _dribble_decode(comp: bytes, insz: int, outsz: int) -> bytes:
    from libdeflate_rsx_tpu.native.host import CInflater
    from libdeflate_rsx_tpu.utils.errors import DecompressStatus

    inf = CInflater()
    out = bytearray()
    pos = 0
    pend = b""
    while not inf.finished:
        st, used = inf.step(pend, out, len(out) + outsz)
        pend = pend[used:]
        if st == DecompressStatus.SHORT_INPUT:
            assert pos < len(comp), "EOF mid-stream"
            pend += comp[pos:pos + insz]
            pos += insz
    return bytes(out)


@pytest.mark.parametrize("insz,outsz", [(1, 17), (7, 1000), (997, 65536)])
def test_cinflater_dribble_protocol(insz, outsz):
    pytest.importorskip("ctypes")
    from libdeflate_rsx_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("no native library")
    data = (make_corpus("text", 30_000, seed=4)
            + make_corpus("random", 5_000, seed=5)
            + b"\x00" * 4_000)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = (co.compress(data[:15_000]) + co.flush(zlib.Z_FULL_FLUSH)
            + co.compress(data[15_000:]) + co.flush())
    assert _dribble_decode(comp, insz, outsz) == data


def test_cinflater_stored_blocks_and_bad_data():
    from libdeflate_rsx_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("no native library")
    from libdeflate_rsx_tpu.native.host import CInflater
    from libdeflate_rsx_tpu.utils.errors import BadDataError

    data = make_corpus("random", 20_000, seed=6)
    assert _dribble_decode(zlib.compress(data, 0)[2:-4], 113, 4096) == data

    inf = CInflater()
    with pytest.raises(BadDataError):
        # BTYPE=11 reserved
        inf.step(b"\x07\x00\x00", bytearray(), 64)


# ------------------------------------------------------ sharded decode
def test_sharded_decompressor_roundtrip():
    from libdeflate_rsx_tpu.parallel import ShardedDecompressor, stream_mesh

    # small streams: this test pins the shard_map wiring + per-item
    # isolation, not kernel internals (test_inflate_tokens.py covers
    # sizes/flush boundaries); interpret-mode cost is ~0.5 s/step on
    # the CPU backend, so step count is the suite's wall-clock budget.
    # One stream (400 B) still crosses a TOK_CHUNK=256 flush boundary.
    datas = [make_corpus("pattern", 90 + 17 * i, seed=i)
             for i in range(8)] + [make_corpus("pattern", 400, seed=8)]
    streams = [zlib.compress(d, 6)[2:-4] for d in datas]
    streams.append(b"\x99garbage!")
    dec = ShardedDecompressor(stream_mesh(), max_steps=1024)
    got = dec.decompress_batch(streams)
    assert got[:9] == datas
    assert got[9] is None


# ----------------------------------------- multi-host global container
def test_compress_global_single_process():
    import gzip

    from libdeflate_rsx_tpu.parallel import multihost as mh

    data = make_corpus("text", 200_000, seed=7)
    out = mh.compress_global(data, "gzip", block_size=65536)
    assert gzip.decompress(out) == data
    z = mh.compress_global(data, "zlib", block_size=65536)
    assert zlib.decompress(z) == data
    raw = mh.compress_global(data, "deflate", block_size=65536)
    assert zlib.decompress(raw, -15) == data
    assert gzip.decompress(mh.compress_global(b"", "gzip")) == b""


def test_batch_decompressor_device_routes_lockstep():
    """BatchDecompressor(use_device=True) with >=8 items rides the
    lockstep decoder (bucketed step budget) and stays byte-exact with
    per-item isolation."""
    from libdeflate_rsx_tpu.batch import BatchDecompressor

    datas = [make_corpus("pattern", 80 + 9 * i, seed=i)
             for i in range(8)]
    streams = [zlib.compress(d, 6)[2:-4] for d in datas]
    streams.append(b"\x01\x02junk")
    out = BatchDecompressor(use_device=True).decompress_batch(
        streams, [600 for _ in streams])
    assert out[:8] == datas
    assert out[8] is None

"""Lockstep two-pass device decoder (ops/pallas/inflate_tokens.py).

Pass 1 runs in interpret mode on the CPU conftest backend (the same
kernel is compiled and verified on real TPU hardware, see STATUS.md);
pass 2 is the native C resolver. Differential oracle: CPython zlib
produces every stream (the reference's libdeflater-oracle pattern,
SURVEY.md section 4). Streams are kept small because interpret mode
executes the step loop op-by-op.
"""

import random
import zlib

import pytest

from tests.conftest import make_corpus

MAX_STEPS = 2048  # small streams decode in < 1.5k steps


def _run(streams, s=1):
    from libdeflate_rsx_tpu.ops.pallas.inflate_tokens import (
        inflate_device_tokens)

    return inflate_device_tokens(streams, s=s, max_steps=MAX_STEPS)


def _z(data, level=6):
    return zlib.compress(data, level)[2:-4]


def test_all_levels_all_kinds():
    cases = []
    for lvl in (0, 1, 6, 9):
        for kind in ("text", "random", "pattern"):
            cases.append(make_corpus(kind, 350 + 37 * lvl, seed=lvl))
    streams = [_z(d, lvl) for lvl, d in
               zip([0, 0, 0, 1, 1, 1, 6, 6, 6, 9, 9, 9], cases)]
    assert _run(streams) == cases


def test_multiblock_and_tiny():
    d = make_corpus("text", 400, seed=3)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    multi = (co.compress(d[:200]) + co.flush(zlib.Z_FULL_FLUSH)
             + co.compress(d[200:]) + co.flush())
    res = _run([multi, _z(b"x"), _z(b"")])
    assert res[0] == d
    assert res[1] == b"x"
    assert res[2] == b""


def test_small_offsets_and_rle():
    datas = []
    for off in (1, 2, 3, 4, 7):
        r = random.Random(off)
        base = bytes(r.randrange(256) for _ in range(off))
        datas.append((base * (600 // off + 1))[:600])
    datas.append(b"\x00" * 700)
    assert _run([_z(d) for d in datas]) == datas


def test_garbage_and_truncation_yield_none():
    r = random.Random(11)
    good = make_corpus("text", 300, seed=1)
    streams = [
        bytes(r.randrange(256) for _ in range(60)),
        _z(good)[:25],
        b"\x07\x00",
        _z(good),
    ]
    res = _run(streams)
    assert res[3] == good
    for got in res[:3]:
        assert got is None or isinstance(got, bytes)  # never raises
    assert res[1] is None  # truncated must not "succeed"


def test_batch_larger_than_one_group():
    datas = [make_corpus("pattern", 120 + 7 * i, seed=i)
             for i in range(140)]  # > 128 streams -> 2 groups
    assert _run([_z(d, 1) for d in datas]) == datas


def test_stored_block_roundtrip():
    d = make_corpus("random", 500, seed=5)
    assert _run([_z(d, 0)]) == [d]


@pytest.mark.skipif("LDRSX_SLOW_TESTS" not in __import__("os").environ,
                    reason="~5 min interpret-mode compile for the s=2 "
                           "step bucket; set LDRSX_SLOW_TESTS=1 to run "
                           "(validated 256/256 byte-exact in session 3)")
def test_sublane_s2_lockstep():
    """S=2 sublane packing (256 streams per grid cell) must decode
    byte-exactly. Uses the 1024-step bucket: the 2048-step bucket's
    interpret-mode compile exceeds practical CPU budgets at s=2."""
    import numpy as np

    rng = np.random.default_rng(7)
    raws = []
    for i in range(256):
        n = int(rng.integers(60, 300))
        if i % 3 == 0:
            raw = bytes(rng.integers(97, 103, n).astype(np.uint8))
        elif i % 3 == 1:
            raw = (b"abcabcabd" * 40)[:n]
        else:
            raw = bytes(rng.integers(0, 256, n).astype(np.uint8))
        raws.append(raw)
    streams = [_z(r) for r in raws]
    from libdeflate_rsx_tpu.ops.pallas.inflate_tokens import (
        inflate_device_tokens)

    res = inflate_device_tokens(streams, s=2, max_steps=1024)
    assert res == raws

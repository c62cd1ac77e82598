"""Multi-chip shard_map batch encode on the virtual 8-device CPU mesh.

The analog of the reference's parallel-chunking integration tests
(reference tests/parallel_test.rs): size thresholds that force every
parallel path, validated by byte-exact round trips through CPython zlib.
"""

import gzip
import zlib

import pytest

from conftest import make_corpus


@pytest.fixture(scope="module")
def mesh():
    from libdeflate_rsx_tpu.parallel import stream_mesh
    return stream_mesh()


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


@pytest.mark.parametrize("nblocks", [1, 3, 8, 17])
def test_sharded_deflate_roundtrip(mesh, nblocks):
    from libdeflate_rsx_tpu.parallel import ShardedCompressor
    bs = 2048
    comp = ShardedCompressor(mesh=mesh, block_size=bs)
    data = make_corpus("pattern", nblocks * bs - 123, seed=nblocks)
    out = comp.compress(data, format="deflate")
    assert zlib.decompress(out, -15) == data


def test_sharded_gzip_checksum_combine(mesh):
    from libdeflate_rsx_tpu.parallel import ShardedCompressor
    comp = ShardedCompressor(mesh=mesh, block_size=1024)
    data = make_corpus("text", 10 * 1024 + 17)
    assert gzip.decompress(comp.compress(data, format="gzip")) == data


def test_sharded_zlib_checksum_combine(mesh):
    from libdeflate_rsx_tpu.parallel import ShardedCompressor
    comp = ShardedCompressor(mesh=mesh, block_size=1024)
    data = make_corpus("pattern", 9 * 1024)
    assert zlib.decompress(comp.compress(data, format="zlib")) == data


def test_sharded_batch_many_inputs(mesh):
    from libdeflate_rsx_tpu.parallel import ShardedCompressor
    comp = ShardedCompressor(mesh=mesh, block_size=1024)
    inputs = [make_corpus("pattern", n, seed=n)
              for n in (1, 100, 1024, 5000, 3 * 1024)]
    outs = comp.compress_batch(inputs)
    assert len(outs) == len(inputs)
    for data, out in zip(inputs, outs):
        assert zlib.decompress(out, -15) == data


def test_sharded_empty_batch(mesh):
    from libdeflate_rsx_tpu.parallel import ShardedCompressor
    comp = ShardedCompressor(mesh=mesh, block_size=1024)
    assert comp.compress_batch([]) == []


def test_graft_entry_single_chip():
    """The driver's compile check, reproduced on CPU."""
    import sys
    sys.path.insert(0, "/root/repo")
    import jax
    from __graft_entry__ import entry
    fn, args = entry()
    rows, byte_off, rowbits, total_bits, nbytes = jax.jit(fn)(*args)
    assert rows.shape[0] == args[0].shape[0]
    assert int(nbytes.sum()) > 0


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_sharded_dynamic_tier_roundtrip():
    """Dynamic-Huffman tier over the mesh: sharded analyze -> host
    tables -> sharded emit (only histograms cross the link)."""
    import zlib

    from libdeflate_rsx_tpu.parallel.shard import (
        ShardedCompressor,
        stream_mesh,
    )
    from tests.conftest import make_corpus

    sc = ShardedCompressor(stream_mesh(), block_size=16384, tier="dynamic")
    data = make_corpus("text", 200000)
    comp = sc.compress(data)
    assert zlib.decompress(comp, -15) == data
    # beats the static tier on entropy-skewed data
    stat = ShardedCompressor(stream_mesh(), block_size=16384,
                             tier="static").compress(data)
    assert len(comp) < len(stat)


def test_sharded_dynamic_batch_fault_free():
    import zlib

    from libdeflate_rsx_tpu.parallel.shard import (
        ShardedCompressor,
        stream_mesh,
    )
    from tests.conftest import make_corpus

    sc = ShardedCompressor(stream_mesh(), block_size=16384, tier="dynamic")
    items = [make_corpus("text", 30000, seed=i) for i in range(5)] + [b""]
    outs = sc.compress_batch(items)
    for d, o in zip(items, outs):
        assert zlib.decompress(o, -15) == d

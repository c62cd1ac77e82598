"""Pallas device-decode kernel test (TPU hardware only: the kernel's
bit-serial loops are impractically slow under the Pallas interpreter, so
CPU CI skips this; run with RUN_TPU_TESTS=1 on a real chip)."""

import os

import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("RUN_TPU_TESTS") != "1",
    reason="needs real TPU (set RUN_TPU_TESTS=1)")


@requires_tpu
def test_pallas_inflate_roundtrip():
    import numpy as np
    from libdeflate_rsx_tpu.models.greedy_static import (
        _stored_block, deflate_device_static)
    from libdeflate_rsx_tpu.ops.pallas.inflate_static import (
        inflate_device_static)

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, 100, dtype=np.uint8)
    datas = [np.tile(base, n // 100 + 2)[:n].tobytes()
             for n in (100, 5000, 60000)]
    outs = inflate_device_static(
        [deflate_device_static(d) for d in datas])
    assert outs == datas
    rd = rng.integers(0, 256, 30000, dtype=np.uint8).tobytes()
    assert inflate_device_static([_stored_block(rd, True)])[0] == rd

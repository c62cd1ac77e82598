"""Benchmark: device batch DEFLATE compression throughput (level-1 tier).

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
Measures the flagship gather-free static-Huffman block encoder
(ops/encode_v2.py) end-to-end from host bytes to host bytes — device
launches of 64 blocks x 64 KiB pipelined, native-C ragged assembly — and
compares against CPython zlib level 1 (the C control arm, per BASELINE.md
/ the reference's head-to-head-vs-libdeflater method, reference
benches/bench_main.rs).
"""

from __future__ import annotations

import json
import os
import time
import zlib

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import numpy as np

LAUNCH_ROWS = 16
BLOCK = 65536


def make_corpus(size: int, seed: int = 1234) -> bytes:
    """Deterministic compressible corpus (the reference bench recipe:
    a repeated ~100-byte pseudo-pattern, reference
    scripts/gen_bench_files.py:29-40, plus scattered literals)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, 100, dtype=np.uint8)
    reps = size // len(base) + 1
    data = np.tile(base, reps)[:size].copy()
    idx = rng.integers(0, size, size // 200)
    data[idx] = rng.integers(0, 256, len(idx), dtype=np.uint8)
    return data.tobytes()


def main() -> None:
    from libdeflate_rsx_tpu.models.greedy_static import deflate_device_static

    size = 32 * 1024 * 1024
    data = make_corpus(size)

    # correctness gate: raw-deflate stream must round trip through zlib
    small = make_corpus(LAUNCH_ROWS * BLOCK, seed=7)
    assert zlib.decompress(
        deflate_device_static(small, BLOCK, LAUNCH_ROWS), -15) == small

    # warmup (compile is cached across runs via JAX_COMPILATION_CACHE_DIR)
    deflate_device_static(data, BLOCK, LAUNCH_ROWS)
    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = deflate_device_static(data, BLOCK, LAUNCH_ROWS)
    dt = (time.perf_counter() - t0) / n_iter
    gbps = size / dt / 1e9
    assert zlib.decompress(out, -15) == data

    # control arm: single-core C zlib level 1 on the same host
    t0 = time.perf_counter()
    zlib.compress(data, 1)
    zlib_dt = time.perf_counter() - t0
    zlib_gbps = size / zlib_dt / 1e9

    print(json.dumps({
        "metric": "batch_compress_level1_64KiB_blocks",
        "value": round(gbps, 4),
        "unit": "GB/s/chip",
        "vs_baseline": round(gbps / zlib_gbps, 3),
    }))


if __name__ == "__main__":
    main()

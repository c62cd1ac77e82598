"""Benchmark: device batch DEFLATE compression throughput (level-1 tier).

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
Measures the flagship static-Huffman block encoder (64 KiB blocks,
vectorized matchfinding + greedy cover + scan/scatter bit packing) on the
real device, end-to-end from host bytes to host bytes, and compares against
CPython zlib level 1 (the C control arm, per BASELINE.md / the reference's
head-to-head-vs-libdeflater method, reference benches/bench_main.rs).
"""

from __future__ import annotations

import json
import time
import zlib

import numpy as np


def make_corpus(size: int, seed: int = 1234) -> bytes:
    """Deterministic compressible corpus (the reference bench recipe:
    a repeated ~100-byte pseudo-pattern, reference
    scripts/gen_bench_files.py:29-40, plus mild randomness)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, 100, dtype=np.uint8)
    reps = size // len(base) + 1
    data = np.tile(base, reps)[:size].copy()
    # sprinkle literals so the stream is not one giant match
    idx = rng.integers(0, size, size // 200)
    data[idx] = rng.integers(0, 256, len(idx), dtype=np.uint8)
    return data.tobytes()


def main() -> None:
    import jax

    from libdeflate_rsx_tpu.models.greedy_static import deflate_device_static

    size = 32 * 1024 * 1024
    data = make_corpus(size)

    # correctness gate: raw-deflate stream must round trip through zlib
    small = make_corpus(1 << 20, seed=7)
    assert zlib.decompress(deflate_device_static(small), -15) == small

    # warmup (compile) + timed runs
    deflate_device_static(data)
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = deflate_device_static(data)
    dt = (time.perf_counter() - t0) / n_iter
    gbps = size / dt / 1e9

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

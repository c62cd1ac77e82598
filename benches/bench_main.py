#!/usr/bin/env python3
"""Comprehensive benchmark harness (reference benches/bench_main.rs parity).

Groups: Compress (levels x sizes), Decompress (levels x sizes), Checksums
(large/micro/nano/tail/unaligned), per-offset decode, Batch, Stream — each
head-to-head with the C control arm (CPython zlib / binascii) on the same
machine, mirroring the reference's criterion-vs-libdeflater method.

Writes benches/results.json and prints a table. Throughput is bytes/s of
UNCOMPRESSED data (the reference's convention).

Usage: python benches/bench_main.py [--quick] [--device]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pattern(size: int, seed: int = 1234) -> bytes:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, 100, dtype=np.uint8)
    data = np.tile(base, size // 100 + 1)[:size].copy()
    idx = rng.integers(0, size, size // 200)
    data[idx] = rng.integers(0, 256, len(idx), dtype=np.uint8)
    return data.tobytes()


def timeit(fn, *args, min_time: float = 0.2, max_iter: int = 50) -> float:
    fn(*args)  # warm
    n, t0 = 0, time.perf_counter()
    while True:
        fn(*args)
        n += 1
        dt = time.perf_counter() - t0
        if dt >= min_time or n >= max_iter:
            return dt / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--device", action="store_true",
                    help="include device (JAX) encoder/checksum groups")
    args = ap.parse_args()

    import libdeflate_rsx_tpu as ld

    results: list[dict] = []

    def rec(group, name, nbytes, secs, control=None):
        row = {"group": group, "name": name,
               "throughput_mbps": round(nbytes / secs / 1e6, 2)}
        if control is not None:
            row["control_mbps"] = round(nbytes / control / 1e6, 2)
            row["vs_control"] = round(control / secs, 3)
        results.append(row)
        ctrl = (f"  [zlib {row['control_mbps']:9.1f} MB/s  "
                f"x{row['vs_control']}]" if control else "")
        print(f"{group:12s} {name:28s} {row['throughput_mbps']:9.1f} MB/s{ctrl}")

    sizes = {"xxs": 1 << 10, "s": 64 << 10, "m": 1 << 20}
    if not args.quick:
        sizes["l"] = 4 << 20

    # -- Compress (host engine) -------------------------------------------
    levels = [1, 6] if args.quick else [1, 6, 9, 10]
    for name, size in sizes.items():
        data = pattern(size)
        for level in levels:
            if level >= 10 and size > (64 << 10):
                continue  # DP parser: python-host tier, keep inputs small
            c = ld.Compressor(level)
            secs = timeit(c.compress_deflate, data)
            ctrl = timeit(lambda d: zlib.compress(d, min(level, 9)), data)
            rec("compress", f"level{level}/{name}", size, secs, ctrl)

    # -- Decompress (host engine) -----------------------------------------
    for name, size in sizes.items():
        if size > (1 << 20):
            continue  # python host decoder tier
        data = pattern(size)
        comp = zlib.compress(data, 6)[2:-4]
        d = ld.Decompressor()
        secs = timeit(d.decompress_deflate, comp, size)
        ctrl = timeit(lambda c: zlib.decompress(c, -15), comp)
        rec("decompress", f"level6/{name}", size, secs, ctrl)

    # -- Checksums ----------------------------------------------------------
    for name, size in [("large", 4 << 20), ("micro", 4096), ("nano", 64),
                       ("tail", 1031), ("unaligned", (1 << 20) + 1)]:
        data = pattern(size)
        secs = timeit(ld.crc32, data)
        ctrl = timeit(zlib.crc32, data)
        rec("crc32", name, size, secs, ctrl)
        secs = timeit(ld.adler32, data)
        ctrl = timeit(zlib.adler32, data)
        rec("adler32", name, size, secs, ctrl)

    # -- Per-offset decode (offsets 1..32) ----------------------------------
    for off in ([3, 8, 18] if args.quick else [1, 2, 3, 4, 8, 16, 18, 32]):
        base = bytes((37 * i + 11) % 256 for i in range(off))
        data = (base * ((1 << 20) // off + 1))[: 1 << 20]
        comp = zlib.compress(data, 9)[2:-4]
        d = ld.Decompressor()
        secs = timeit(d.decompress_deflate, comp, len(data))
        ctrl = timeit(lambda c: zlib.decompress(c, -15), comp)
        rec("offset", f"decode/off{off}", len(data), secs, ctrl)

    # -- Batch ---------------------------------------------------------------
    chunks = [pattern(32 << 10, seed=i) for i in range(32)]
    bc = ld.BatchCompressor(level=1)
    secs = timeit(bc.compress_batch, chunks)
    rec("batch", "compress/32x32KB/level1", 32 * (32 << 10), secs)

    # -- Stream ---------------------------------------------------------------
    import io
    data = pattern(2 << 20)

    def stream_encode(d):
        sink = io.BytesIO()
        with ld.DeflateEncoder(sink, level=6) as enc:
            enc.write(d)
        return sink.getvalue()

    secs = timeit(stream_encode, data)
    rec("stream", "encode/2MB/level6", len(data), secs)

    # -- Device groups --------------------------------------------------------
    if args.device:
        from libdeflate_rsx_tpu.models.greedy_static import (
            deflate_device_static)
        from libdeflate_rsx_tpu.ops.checksums import (
            adler32_device, crc32_device)

        data = pattern(16 << 20)
        secs = timeit(deflate_device_static, data, 65536, 16)
        ctrl = timeit(lambda d: zlib.compress(d, 1), data)
        rec("device", "compress/16MB/level1-tier", len(data), secs, ctrl)
        data = pattern(8 << 20)
        secs = timeit(crc32_device, data)
        ctrl = timeit(zlib.crc32, data)
        rec("device", "crc32/8MB", len(data), secs, ctrl)
        secs = timeit(adler32_device, data)
        ctrl = timeit(zlib.adler32, data)
        rec("device", "adler32/8MB", len(data), secs, ctrl)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\n{len(results)} results -> {out}")


if __name__ == "__main__":
    main()

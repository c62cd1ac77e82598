#!/usr/bin/env python3
"""Deterministic benchmark corpus generator (the reference's
scripts/gen_bench_files.py recipe): sizes XXS 1 KB → XL 64 MB from a fixed
100-byte pseudo-pattern, per-offset periodic files (offsets 1-32), and
"small match" variants that break matches with scattered literals."""

from __future__ import annotations

import argparse
import os

import numpy as np

SIZES = {
    "xxs": 1 << 10, "xs": 16 << 10, "s": 64 << 10,
    "m": 1 << 20, "l": 8 << 20, "xl": 64 << 20,
}


def pattern(size: int, seed: int = 1234) -> bytes:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, 100, dtype=np.uint8)
    return np.tile(base, size // 100 + 1)[:size].tobytes()


def periodic(period: int, size: int) -> bytes:
    base = bytes((37 * i + 11) % 256 for i in range(period))
    return (base * (size // period + 1))[:size]


def small_match(size: int, seed: int = 99) -> bytes:
    rng = np.random.default_rng(seed)
    data = np.frombuffer(pattern(size), np.uint8).copy()
    idx = rng.integers(0, size, size // 50)
    data[idx] = rng.integers(0, 256, len(idx), dtype=np.uint8)
    return data.tobytes()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_corpus")
    ap.add_argument("--max-size", default="l",
                    choices=list(SIZES), help="largest size tier to emit")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    limit = SIZES[args.max_size]
    for name, size in SIZES.items():
        if size > limit:
            continue
        with open(os.path.join(args.out, f"pattern_{name}.bin"), "wb") as f:
            f.write(pattern(size))
        with open(os.path.join(args.out, f"smallmatch_{name}.bin"), "wb") as f:
            f.write(small_match(size))
    for off in list(range(1, 33)):
        with open(os.path.join(args.out, f"offset_{off}.bin"), "wb") as f:
            f.write(periodic(off, 1 << 20))
    print(f"corpus written to {args.out}/")


if __name__ == "__main__":
    main()

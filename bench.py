"""Benchmark: device DEFLATE compression throughput per chip (level-1 tier).

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the gather-free static-Huffman block encoder (ops/encode_v2.py)
as sustained on-device throughput: a serial lax.fori_loop of chunk
encodes inside one jit (so neither host dispatch latency nor the
development tunnel's ~25 MB/s host<->device link is measured — the
BASELINE.json metric is GB/s per chip). Correctness is gated end-to-end:
the full host->device->host stream must round trip through CPython zlib.
vs_baseline compares against single-core C zlib level 1 on the same host
(the reference's control-arm method, reference benches/bench_main.rs).
"""

from __future__ import annotations

import json
import os
import time
import zlib

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import numpy as np

# Launch shape swept on hardware this round: 16 KiB blocks x 128 rows
# x 4-deep unroll keeps ~512 independent block subgraphs in flight,
# which is what hides each block's sort/scan dependency chain (the
# encoder is latency-bound per block, throughput-bound in aggregate).
# 16 KiB blocks trade ~11% ratio vs 64 KiB for ~35% more throughput;
# both block sizes are production options (models/greedy_static.py).
LAUNCH_ROWS = 128
BLOCK = 16384


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


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _device_watchdog(seconds: float = 300.0):
    """Abort instead of hanging forever if the accelerator tunnel is
    down: PJRT init for the dev tunnel blocks with no timeout of its
    own. The watchdog is disarmed as soon as devices are acquired."""
    import threading

    armed = threading.Event()

    def boom():
        if not armed.wait(seconds):
            import sys
            print("bench.py: device init exceeded "
                  f"{seconds:.0f}s (tunnel down?) — aborting",
                  file=sys.stderr, flush=True)
            os._exit(1)

    threading.Thread(target=boom, daemon=True).start()
    return armed


def main() -> None:
    disarm = _device_watchdog()
    import jax
    import jax.numpy as jnp

    jax.devices()
    disarm.set()

    from libdeflate_rsx_tpu.models.greedy_static import deflate_device_static
    from libdeflate_rsx_tpu.ops import encode_v2 as e2

    # correctness gate: end-to-end stream must round trip through zlib
    small = make_corpus(LAUNCH_ROWS * BLOCK, seed=7)
    assert zlib.decompress(
        deflate_device_static(small, BLOCK, LAUNCH_ROWS), -15) == small

    # sustained on-device throughput of the PRODUCTION launch shape
    # (deflate_device_static's unrolled chunk pipeline: independent
    # chunk subgraphs inside one jit, which XLA interleaves to hide
    # each chunk's sort/scan dependency chain)
    unroll = 4
    size = unroll * LAUNCH_ROWS * BLOCK
    data = make_corpus(size)
    arr = np.zeros((unroll, LAUNCH_ROWS, BLOCK + e2.BLOCK_PAD), np.uint8)
    flat = np.frombuffer(data, np.uint8).reshape(
        unroll, LAUNCH_ROWS, BLOCK)
    arr[:, :, :BLOCK] = flat
    enc = e2.jit_encoder_scan(BLOCK, unroll)

    # K launches inside ONE jit with a single scalar sync at the end:
    # per-call sync over the dev tunnel costs a VARIABLE ~30 ms, so
    # single-call timings measure the tunnel, not the chip. Inputs are
    # perturbed per iteration so nothing can fold across iterations.
    K = 4

    @jax.jit
    def probe(a, v, fin):
        def body(i, acc):
            out = enc(a + i.astype(jnp.uint8), v, fin)
            return acc + out[4].sum() + out[0].reshape(-1)[0].astype(
                jnp.int32)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    a = jnp.asarray(arr)
    v = jnp.asarray(np.full((unroll, LAUNCH_ROWS), BLOCK, np.int32))
    fin = jnp.asarray(np.zeros((unroll, LAUNCH_ROWS), bool))
    int(probe(a, v, fin))                 # compile + warm

    # Per-run measured dispatch+sync offset (the dev tunnel adds a
    # variable ~10-50 ms per call that is NOT device compute): time a
    # trivial jit with the same int() sync pattern and subtract it.
    @jax.jit
    def _nop(x):
        return x + 1

    int(_nop(jnp.int32(0)))
    sync0 = min(_timed(lambda: int(_nop(jnp.int32(0)))) for _ in range(10))
    # best-of: the host core is shared (driver/telemetry), so the mean
    # over-counts scheduler noise; the fastest run is the honest
    # device-throughput observation (criterion's min-based estimator)
    dt = min(_timed(lambda: int(probe(a, v, fin))) for _ in range(6))
    gbps = K * size / max(dt - sync0, 1e-9) / 1e9

    # control arm: single-core C zlib level 1 on the same host
    big = make_corpus(32 << 20)
    zlib_dt = min(_timed(lambda: zlib.compress(big, 1)) for _ in range(3))
    zlib_gbps = len(big) / zlib_dt / 1e9

    print(json.dumps({
        "metric": "compress_level1_tier_device_chunks",
        "value": round(gbps, 4),
        "unit": "GB/s/chip",
        "vs_baseline": round(gbps / zlib_gbps, 3),
    }))


if __name__ == "__main__":
    main()

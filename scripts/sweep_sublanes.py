"""Hardware sweep: sublane packing factor S for the lockstep pass-1
decoder (ops/pallas/inflate_tokens.py).

S sublanes x 128 lanes = S*128 streams per grid cell. The step cost is
dominated by gathers/compares over (S,128) int32 vectors; the native
int32 VMEM tile is (8,128), so S in {1,2,4,8} should share one tile and
cost ~the same per step — making throughput ~linear in S until the
vector units saturate. This script validates byte-exactness on the real
chip at each S, then measures sustained pass-1 throughput at a fixed
TOTAL of 256 streams (so s=1 runs 2 grid cells, s=2 runs 1, ...) and at
full occupancy per S.

Run on a real TPU:  python scripts/sweep_sublanes.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import zlib

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pattern(size: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, 100, dtype=np.uint8)
    data = np.tile(base, size // len(base) + 1)[:size].copy()
    idx = rng.integers(0, size, size // 200)
    data[idx] = rng.integers(0, 256, len(idx), dtype=np.uint8)
    return data.tobytes()


def main() -> None:
    import jax
    import jax.numpy as jnp
    from libdeflate_rsx_tpu.ops.pallas import inflate_tokens as itk

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    BLOCK = 16384 * 4 - 1024          # ~63 KiB per stream
    MAX_STEPS = 72 * 1024
    K = 4                              # fori_loop reps inside one jit
    results = []

    combos = []
    import os
    want = os.environ.get("LDRSX_SWEEP_S")
    svals = tuple(int(x) for x in want.split(",")) if want else (1, 2, 4)
    for s in svals:
        for n_streams in (256, s * 128):
            if (s, n_streams) not in combos:
                combos.append((s, n_streams))
    for s, n_streams in combos:
            lanes = s * 128
            groups = max(1, -(-n_streams // lanes))
            label = f"s={s} n={n_streams} groups={groups}"
            try:
                cs = [pattern(BLOCK, seed=i) for i in range(n_streams)]
                za = [zlib.compress(c, 6)[2:-4] for c in cs]
                # correctness gate on hardware through the public path
                t0 = time.perf_counter()
                outs = itk.inflate_device_tokens(za, s=s,
                                                 max_steps=MAX_STEPS)
                ok = outs == cs
                t_first = time.perf_counter() - t0
                if not ok:
                    bad = sum(1 for o, c in zip(outs, cs) if o != c)
                    results.append({"s": s, "n": n_streams, "ok": False,
                                    "bad": bad})
                    print(f"{label}: BYTE-EXACT FAIL ({bad}/{n_streams})",
                          flush=True)
                    continue

                # sustained pass-1: two input sets alternate so XLA
                # cannot hoist the kernel out of the loop
                zb = [zlib.compress(pattern(BLOCK, seed=900 + i),
                                    6)[2:-4] for i in range(n_streams)]
                ia, wa, _, _ = itk.pack_streams(za, s)
                ib, wb, _, _ = itk.pack_streams(zb, s)
                consts = itk._consts(s)
                run = itk._jit_pass1(groups, s, MAX_STEPS)
                ja, jwa = jnp.asarray(ia), jnp.asarray(wa)
                jb, jwb = jnp.asarray(ib), jnp.asarray(wb)

                @jax.jit
                def probe(la, wa2, lb, wb2):
                    def body(i, acc):
                        l_ = jnp.where(i % 2 == 0, la, lb)
                        w_ = jnp.where(i % 2 == 0, wa2, wb2)
                        toks, stats = run(l_, *consts, w_)
                        return (acc + stats[:, 1].sum()
                                + toks[0, 0, 0, 0, 0])
                    return jax.lax.fori_loop(0, K, body, jnp.int32(0))

                int(probe(ja, jwa, jb, jwb))           # compile+warm
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(probe(ja, jwa, jb, jwb))
                    times.append((time.perf_counter() - t0) / K)
                secs = min(times)
                tot = sum(len(c) for c in cs)
                gbps = tot / secs / 1e9
                results.append({"s": s, "n": n_streams, "ok": True,
                                "gbps": round(gbps, 3),
                                "ms_per_batch": round(secs * 1e3, 2),
                                "first_call_s": round(t_first, 1)})
                print(f"{label}: {gbps:.3f} GB/s  "
                      f"({secs*1e3:.1f} ms/batch, first {t_first:.0f}s)",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — sweep must survive
                results.append({"s": s, "n": n_streams, "ok": False,
                                "error": repr(e)[:200]})
                print(f"{label}: ERROR {e!r}", flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "benches",
                       "sublane_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Quick head-to-head: host compress/decompress vs C libdeflate on the
Silesia-like corpus. Iteration harness for matchfinder work — the
committed numbers live in benches/results.json (bench_main.py).

Usage: python scripts/perf_l6.py [level] [reps] [member ...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "benches"))
import libdeflate_control as ld  # noqa: E402

from libdeflate_rsx_tpu import engine as host  # noqa: E402

CORPUS = Path(__file__).resolve().parent.parent / "benches" / "corpus"


def best(fn, reps):
    dt = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt.append(time.perf_counter() - t0)
    return min(dt)


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    members = sys.argv[3:] or sorted(p.name for p in CORPUS.iterdir())
    tot_n = tot_ours = tot_ld = 0
    tot_on = tot_ln = 0
    print(f"{'member':>10} {'MB':>6} {'ours MB/s':>10} {'ld MB/s':>9} "
          f"{'x':>6} {'ratio':>6} {'ld_ratio':>8}")
    for m in members:
        data = (CORPUS / m).read_bytes()
        n = len(data)
        out = host.compress_raw(data, level)
        dt_o = best(lambda: host.compress_raw(data, level), reps)
        lout = ld.compress(data, level, "deflate")
        dt_l = best(lambda: ld.compress(data, level, "deflate"), reps)
        print(f"{m:>10} {n/1e6:6.1f} {n/dt_o/1e6:10.1f} {n/dt_l/1e6:9.1f} "
              f"{dt_l/dt_o:6.2f} {n/len(out):6.3f} {n/len(lout):8.3f}")
        tot_n += n
        tot_ours += dt_o
        tot_ld += dt_l
        tot_on += len(out)
        tot_ln += len(lout)
    print(f"{'TOTAL':>10} {tot_n/1e6:6.1f} {tot_n/tot_ours/1e6:10.1f} "
          f"{tot_n/tot_ld/1e6:9.1f} {tot_ld/tot_ours:6.2f} "
          f"{tot_n/tot_on:6.3f} {tot_n/tot_ln:8.3f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Scaling-efficiency series: sharded device encode over 1/2/4/8-device
meshes (BASELINE.md: "scaling efficiency (1 chip -> 1 host -> N hosts)").

Each mesh size runs in its own subprocess (device count is fixed at
backend init) compressing the same buffer with ShardedCompressor; rows
record throughput and efficiency vs the 1-device run. On the virtual CPU
mesh all devices share the host's cores, so efficiency reflects
orchestration overhead (sharding, all-gather offset scan, assembly), not
chip compute; on a real slice the same path scales with chips.

Writes benches/scaling.json.

Usage: python benches/bench_scaling.py [--sizes 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_WORKER = r"""
import json, sys, time, zlib
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
n = int(sys.argv[1])
assert len(jax.devices()) == n, (len(jax.devices()), n)
from libdeflate_rsx_tpu.parallel.shard import ShardedCompressor, stream_mesh

rng = np.random.default_rng(1234)
base = rng.integers(0, 256, 100, dtype=np.uint8)
size = n * 2 * 65536
data = np.tile(base, size // 100 + 1)[:size]
idx = rng.integers(0, size, size // 200)
data[idx] = rng.integers(0, 256, len(idx), dtype=np.uint8)
data = data.tobytes()

sc = ShardedCompressor(stream_mesh())
comp = sc.compress(data)                    # compile + warm
assert zlib.decompress(comp, -15) == data
t0 = time.perf_counter(); it = 0
while time.perf_counter() - t0 < 2.0:
    sc.compress(data); it += 1
dt = (time.perf_counter() - t0) / it
print(json.dumps({"n_devices": n, "bytes": size,
                  "throughput_mbps": round(size / dt / 1e6, 2)}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for n in [int(x) for x in args.sizes.split(",")]:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run([sys.executable, "-c", _WORKER, str(n)],
                             env=env, capture_output=True, text=True)
        if out.returncode != 0:
            print(f"n={n} FAILED:\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        row = json.loads(out.stdout.strip().splitlines()[-1])
        rows.append(row)
        print(f"mesh={row['n_devices']:2d}  "
              f"{row['throughput_mbps']:8.1f} MB/s")
    if rows:
        base = rows[0]["throughput_mbps"]
        for r in rows:
            r["efficiency"] = round(
                r["throughput_mbps"] / (base * r["n_devices"]), 3)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling.json")
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"{len(rows)} rows -> {path}")


if __name__ == "__main__":
    main()

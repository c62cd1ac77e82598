#!/usr/bin/env python3
"""Weak-scaling series: sharded device encode over 1/2/4/8-device
meshes with FIXED WORK PER DEVICE (BASELINE.md: "scaling efficiency
(1 chip -> 1 host -> N hosts)").

HONEST-SIGNAL NOTE (round-2 review item): on the virtual CPU mesh every
"device" shares one physical core, so NO throughput number here carries
chip-scaling signal. What a virtual mesh CAN measure is orchestration
overhead: with fixed work per device, the time per device-chunk would be
constant under perfect orchestration regardless of mesh size. Rows
therefore report `orchestration_efficiency` = unit_time(1 dev) /
unit_time(n dev); chip scaling itself must be measured on a real slice
(the same code path, nothing virtual-specific).

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
        # fixed work per device: unit_time = wall / n_devices; perfect
        # orchestration keeps it flat as the mesh grows
        for r in rows:
            r["unit_time_ms"] = round(
                r["bytes"] / r["n_devices"]
                / (r["throughput_mbps"] * 1e6) * 1e3, 3)
        base_unit = rows[0]["unit_time_ms"]
        for r in rows:
            r["orchestration_efficiency"] = round(
                base_unit / r["unit_time_ms"], 3)
            r["mode"] = "weak-scaling-virtual-mesh"
            r["signal"] = ("orchestration-overhead-only: virtual devices "
                           "share one core; chip scaling needs a real "
                           "slice")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling.json")
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"{len(rows)} rows -> {path}")


if __name__ == "__main__":
    main()

"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This replaces the reference's "multi-thread without a cluster" trick
(SURVEY.md §4): multi-chip shard_map paths run against
xla_force_host_platform_device_count=8 CPU devices, while the real TPU is
exercised by bench.py / __graft_entry__.py.
"""

import os

# Force the virtual CPU mesh even when the environment points JAX at a
# real accelerator: unit tests must be hermetic and exercise the 8-device
# shard_map paths; bench.py / __graft_entry__.entry() use the real chip.
# The platform plugin may pre-set jax.config.jax_platforms, which takes
# precedence over the env var, so override at the config level too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache for the XLA-cacheable compiles (device
# encode/resolve jits). Interpret-mode pallas executables are NOT
# persistable (measured: the ~5 min pass-1 compile recurs per process),
# so the suite also minimizes distinct pass-1 step buckets — see
# steps_for_caps in ops/pallas/inflate_tokens.py.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

# Drop any accelerator plugin backends that a site hook may have
# registered before this file ran: when the dev tunnel behind such a
# plugin is unreachable its PJRT init can hang the whole test run, and
# the tests never use it (they force the virtual CPU mesh above).
try:  # defensive: private API, absence must not break tests
    from jax._src import xla_bridge as _xb

    def _disabled_backend_factory(*_a, **_k):
        raise RuntimeError("accelerator backends are disabled in tests")

    for _name, _reg in list(getattr(_xb, "_backend_factories", {}).items()):
        if _name != "cpu" and hasattr(_reg, "_replace"):
            # keep the platform *registered* (pallas lowering rules need
            # the platform name known) but make init fail fast + quiet
            _xb._backend_factories[_name] = _reg._replace(
                factory=_disabled_backend_factory, fail_quietly=True)
except Exception:
    pass

import random

import numpy as np
import pytest


@pytest.fixture
def rng():
    return random.Random(0x5EED)


@pytest.fixture
def nprng():
    return np.random.default_rng(0x5EED)


def make_corpus(kind: str, size: int, seed: int = 1234) -> bytes:
    """Deterministic test corpora in the spirit of the reference's
    gen_bench_files.py recipe (repeated ~100-byte pseudo-pattern), plus
    text-like, random, and periodic variants."""
    r = random.Random(seed)
    if kind == "pattern":
        base = bytes(r.randrange(256) for _ in range(100))
        reps = size // len(base) + 1
        return (base * reps)[:size]
    if kind == "text":
        words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"over",
                 b"lazy", b"dog", b"compression", b"deflate", b"huffman",
                 b"tpu", b"kernel", b"stream"]
        out = bytearray()
        while len(out) < size:
            out += r.choice(words) + b" "
            if r.random() < 0.05:
                out += b"\n"
        return bytes(out[:size])
    if kind == "random":
        return bytes(r.randrange(256) for _ in range(size))
    if kind == "zeros":
        return b"\x00" * size
    if kind.startswith("periodic"):
        period = int(kind.split(":")[1])
        base = bytes(r.randrange(256) for _ in range(period))
        reps = size // period + 1
        return (base * reps)[:size]
    raise ValueError(kind)

"""Multi-host (DCN) batch dispatch.

The reference is single-process (rayon); SURVEY.md §2 specifies the
TPU-native scaling path: shard batches of independent streams across
hosts over DCN with `jax.distributed`, keep block encoding local to each
host's chips (ICI), and reduce only tiny metadata (sizes, checksum
registers) globally. That shape is exactly what this module implements:

 - `initialize()` — standard pod bring-up (jax.distributed).
 - `process_local_batch()` — deterministic round-robin split of a global
   batch; every host computes the same split, no coordination traffic.
 - `compress_local_shard()` — this host's shard through the sharded
   device encoder on LOCAL devices only (compressed streams are
   independent; nothing host-crossing in the hot path).
 - `global_sizes()` — the one true DCN collective: an all-gather (psum
   formulation) of per-host compressed byte totals, giving every host
   the global concatenation offsets without moving payload bytes.

Single-host meshes work without any of this; call `initialize()` once per
process on a multi-host slice before using the global helpers. Tested by
tests/test_multihost.py with two real jax.distributed processes on the
CPU backend (the test analog of a 2-host DCN slice).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .shard import AXIS, ShardedCompressor, stream_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-var fallback (the standard
    TPU pod bring-up; a no-op when already initialized)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def global_stream_mesh() -> Mesh:
    """1-D "streams" mesh over every device of every host. With a
    NamedSharding over this mesh, per-host blocks stay on local chips
    (data parallel over DCN) and collectives ride DCN only for the
    per-shard metadata."""
    return Mesh(np.asarray(jax.devices()), (AXIS,))


def process_local_batch(inputs: list) -> list:
    """The shard of a global batch this process should compress: balanced
    round-robin by process index. Deterministic — every host computes
    the same split with zero coordination."""
    pid = jax.process_index()
    n = jax.process_count()
    return [b for i, b in enumerate(inputs) if i % n == pid]


def compress_local_shard(inputs: list, block_size: int = 65536,
                         level_tier: str = "static") -> list[bytes]:
    """Compress this host's round-robin shard of a global batch on this
    host's local devices. Payload bytes never cross DCN: each stream is
    independent, so inter-host traffic is only the metadata exchange in
    `global_sizes` (callers move the compressed bytes with their own
    storage/RPC layer, as in any production batch system)."""
    local = process_local_batch(inputs)
    if not local:
        return []
    sc = ShardedCompressor(stream_mesh(jax.local_devices()),
                           block_size=block_size)
    return sc.compress_batch(local)


def global_sizes(local_total: int) -> np.ndarray:
    """All-gather per-host compressed byte totals over DCN: the exclusive
    scan of the result is every host's write offset for ordered global
    concatenation (SURVEY.md §2: 'all-gather per-block compressed sizes +
    an exclusive-scan of offsets'). Runs a real collective on the global
    mesh — the only inter-host communication in the pipeline."""
    mesh = global_stream_mesh()
    nproc = jax.process_count()
    per_dev = len(jax.local_devices())

    def gather(x):
        return jax.lax.all_gather(jnp.sum(x), AXIS)

    # all_gather replicates the result; VMA inference can't prove that
    # statically, hence check_vma=False with replicated out_specs
    fn = jax.jit(jax.shard_map(gather, mesh=mesh, in_specs=P(AXIS),
                               out_specs=P(None), check_vma=False))
    # each local device contributes total/per_dev; the residue rides
    # device 0 so the global sum is exact
    base = local_total // per_dev
    vals = np.full(per_dev, base, np.int64)
    vals[0] += local_total - base * per_dev
    from jax import make_array_from_process_local_data
    from jax.sharding import NamedSharding
    garr = make_array_from_process_local_data(
        NamedSharding(mesh, P(AXIS)), vals)
    out = np.asarray(fn(garr))          # (n_devices,) per-device totals
    return out.reshape(nproc, per_dev).sum(axis=1)

"""Multi-host (DCN) batch dispatch scaffolding.

The reference is single-process (rayon); SURVEY.md §2 specifies the
TPU-native scaling path: shard batches of independent streams across
hosts over DCN with `jax.distributed`, keep block encoding local to each
host's chips (ICI), and reduce only tiny metadata (sizes, checksum
registers) globally.

Single-host meshes work without any of this; call `initialize()` once per
process on a multi-host slice before building a global mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from .shard import AXIS


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
    (data parallel over DCN) and the all-gather offset scan in
    parallel/shard.py rides DCN only for the per-shard byte totals."""
    return Mesh(np.asarray(jax.devices()), (AXIS,))


def process_local_batch(inputs: list[bytes]) -> list[bytes]:
    """The shard of a global batch this process should compress: balanced
    round-robin by process index (callers gather results with their own
    RPC layer; compressed streams are independent)."""
    pid = jax.process_index()
    n = jax.process_count()
    return [b for i, b in enumerate(inputs) if i % n == pid]

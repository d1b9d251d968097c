"""Multi-host initialisation + helpers.

The reference reaches multi-process through `accelerate launch`/torchrun
(SURVEY §5.8).  The TPU-native path: `jax.distributed.initialize()` on each
host, one global mesh over all chips, per-host data sharding via
``jax.make_array_from_process_local_data`` and process-0 gating for logs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed.initialize (TPU pods autodetect args)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialised (or single-process run)


def is_main_process() -> bool:
    """Replaces accelerator.is_main_process gating."""
    return jax.process_index() == 0


def global_batch_from_local(
    local_batch: Dict[str, np.ndarray], mesh: Mesh
) -> Dict[str, jax.Array]:
    """Assemble a globally-sharded batch from each host's local shard —
    the per-host data sharding that replaces DistributedSampler."""
    out = {}
    for key, value in local_batch.items():
        spec = P("data", *([None] * (value.ndim - 1)))
        out[key] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), value
        )
    return out

"""Device-mesh data parallelism.

The reference's one distribution strategy is DDP data parallelism via HF
Accelerate/NCCL (SURVEY §2.3; train/train_context.py:91-101).  The
TPU-native equivalent: a JAX mesh with a primary ``data`` axis (and a
``model`` axis kept for models that outgrow one chip), params replicated,
batches sharded over ``data``, and XLA GSPMD inserting the gradient
all-reduce over ICI — no hand-written collectives in the step.

Multi-host: the same code runs under ``jax.distributed.initialize`` with
per-host data sharding — ``jax.process_index() == 0`` gates logging, the
one cross-host reduction beyond gradients (the CTC label-prior vector,
reference losses.py:603-611) is part of the compiled epoch-end update.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shard every batch array over the data axis (dim 0)."""
    out = {}
    for key, value in batch.items():
        spec = P("data", *([None] * (value.ndim - 1)))
        out[key] = jax.device_put(value, NamedSharding(mesh, spec))
    return out


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_parallel_train_step(step_fn, mesh: Mesh):
    """jit the stage step over the mesh: state replicated, batch sharded
    over 'data', outputs replicated.  GSPMD handles the grad psum — and
    the CTC label-prior epoch accumulators (reference accelerator.gather,
    losses.py:603-611) reduce the same way: the batch is one global array,
    so the in-step prior sums are already global reductions."""
    replicated = NamedSharding(mesh, P())

    def wrapped(state, batch, rng, frozen=None):
        return step_fn(state, batch, rng, frozen)

    return jax.jit(
        wrapped,
        in_shardings=(replicated, None, replicated, replicated),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(eval_fn, mesh: Mesh):
    """jit a (state, batch, rng, frozen) -> outputs eval step over the mesh."""
    replicated = NamedSharding(mesh, P())

    def wrapped(state, batch, rng, frozen=None):
        return eval_fn(state, batch, rng, frozen)

    return jax.jit(
        wrapped,
        in_shardings=(replicated, None, replicated, replicated),
        out_shardings=replicated,
    )

"""Parameter-count and forward-timing harness.

Parity with the reference's manual perf probes (train/test.py:46-118,
train/cli_util.py:6-21): a per-module parameter table and a timed forward
pass on random inputs."""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(tree))


def param_table(params: Dict[str, dict]) -> str:
    rows = [(key, count_params(value)) for key, value in params.items()]
    rows.append(("TOTAL", sum(n for _, n in rows)))
    width = max(len(k) for k, _ in rows)
    lines = [f"{'module':<{width}}  params"]
    for key, n in rows:
        lines.append(f"{key:<{width}}  {n:,}")
    return "\n".join(lines)


def time_forward(fn, args, iters: int = 10) -> float:
    """Mean wall time per call after a compile warm-up."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

"""Loss accounting: weighted totals + the self-normalised backwards loss.

Parity with the reference LossLog (train/loss_log.py:14-106): every metric
except ``generator`` and ``align_loss`` is normalised by its own detached
magnitude before weighting — a gradient-balancing trick — while the
*reported* total is the plain weighted sum.  Here both are pure functions
of a metrics dict so they live inside the jitted step.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp

RAW_KEYS = ("generator", "align_loss")


def backwards_loss(
    metrics: Mapping[str, jax.Array], weights: Mapping[str, float]
) -> jax.Array:
    total = 0.0
    for key, value in metrics.items():
        if key in RAW_KEYS:
            loss = value
        else:
            loss = value / (jax.lax.stop_gradient(value) + 1e-9)
        total = total + loss * weights.get(key, 1.0)
    return total


def weighted_total(
    metrics: Mapping[str, jax.Array], weights: Mapping[str, float]
) -> jax.Array:
    total = 0.0
    for key, value in metrics.items():
        total = total + value * weights.get(key, 1.0)
    return total


def combine_metrics(metric_list) -> Dict[str, float]:
    """Host-side averaging across logged steps (loss_log.py:109-124)."""
    totals: Dict[str, float] = {}
    counts: Dict[str, int] = {}
    for metrics in metric_list:
        for key, value in metrics.items():
            totals[key] = totals.get(key, 0.0) + float(value)
            counts[key] = counts.get(key, 0) + 1
    return {k: totals[k] / counts[k] for k in totals}


def format_metrics(metrics: Mapping[str, float], total: float) -> str:
    parts = [f"{k}: {float(v):.3f}" for k, v in metrics.items()]
    return f"loss: {total:.3f}, " + ", ".join(parts)

"""Per-module AdamW with the logical-axis cosine schedule and the
gap-aware discriminator learning rate.

Parity with the reference MultiOptimizer (train/optimizers.py): one AdamW
per model key (wd=1e-4, betas=(0.85, 0.99), eps=1e-9); generator modules
follow a cosine schedule over a logical 10k-step axis rescaled to the
stage length with a plateau at 90 %; discriminator LR is slaved every step
to generator LR × a multiplier derived from the EMA of the disc loss.

TPU re-design: the EMA lives in the train state and the multiplier is a
pure function (losses.disc_lr_multiplier), so the whole LR logic stays
inside the compiled step — no host round-trip per step.  We implement this
with ``optax.inject_hyperparams`` so the learning rate is a state field we
overwrite functionally each step.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

LOGICAL_STEP_LIMIT = 10_000
PLATEAU = 0.9

# Optimizer state layout: "tree" applies adam leaf-wise over the param
# pytree; "flat" ravels each module to one vector first.  Round 2 shipped
# "flat" on a measurement ("per-leaf adam ~4 s/step") later shown to be a
# relay-transfer artifact; the round-3 device trace attributed ~2 s/step
# of async HBM DMA to the ravel/unravel traffic, and the A/B
# (scripts/opt_ab.py) confirmed tree wins.  "flat" is kept for checkpoint
# migration and the A/B harness.
_LAYOUT = "tree"


def set_layout(layout: str) -> None:
    global _LAYOUT
    assert layout in ("tree", "flat"), layout
    _LAYOUT = layout


def get_layout() -> str:
    return _LAYOUT


def cosine_logical_lr(
    base_lr: float, step: jax.Array, step_limit: int
) -> jax.Array:
    """transformers.get_cosine_schedule_with_warmup on the logical axis
    (warmup 0), with the 90 % plateau (optimizers.py:94-101)."""
    logical = step * LOGICAL_STEP_LIMIT // max(step_limit, 1)
    logical = jnp.minimum(logical, int(LOGICAL_STEP_LIMIT * PLATEAU))
    progress = logical.astype(jnp.float32) / LOGICAL_STEP_LIMIT
    return base_lr * jnp.maximum(
        0.0, 0.5 * (1.0 + jnp.cos(math.pi * 2.0 * 0.5 * progress))
    )


def make_optimizer() -> optax.GradientTransformation:
    """AdamW with an injectable learning rate."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0,
        b1=0.85,
        b2=0.99,
        eps=1e-9,
        weight_decay=1e-4,
    )


def init_opt_states(params: Dict[str, Any]) -> Dict[str, Any]:
    """One optimizer state per module.

    Layout "tree" (default): adam moments mirror the param pytree — the
    update is per-leaf but stays in place, no extra HBM traffic.  Layout
    "flat": moments over the ravelled vector (legacy round-2 layout; the
    per-step ravel/unravel showed up as ~2 s/step of async DMA in the
    round-3 device trace)."""
    opt = make_optimizer()
    out = {}
    for key in params:
        if _LAYOUT == "tree":
            out[key] = opt.init(params[key])
        else:
            import jax.flatten_util

            flat, _ = jax.flatten_util.ravel_pytree(params[key])
            out[key] = opt.init(flat)
    return out


def migrate_flat_opt_state(flat_state, params):
    """Convert one module's legacy flat-vector adam state (round-2 layout)
    to the tree layout by unravelling the mu/nu moment vectors back onto
    the param pytree.  Used when resuming an old checkpoint."""
    import jax.flatten_util

    unravel = jax.flatten_util.ravel_pytree(params)[1]
    inner = flat_state.inner_state
    adam = inner[0]
    new_adam = adam._replace(mu=unravel(adam.mu), nu=unravel(adam.nu))
    return flat_state._replace(
        inner_state=(new_adam,) + tuple(inner[1:])
    )


def set_learning_rate(opt_state, lr: jax.Array):
    """Functionally override the injected learning rate."""
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = lr
    return opt_state._replace(hyperparams=hyperparams)


def apply_updates(params, grads, opt_state, lr: jax.Array):
    """One AdamW step for a single module at the given LR."""
    opt = make_optimizer()
    opt_state = set_learning_rate(opt_state, lr)
    if _LAYOUT == "tree":
        updates, new_opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state
    import jax.flatten_util

    flat_params, unravel = jax.flatten_util.ravel_pytree(params)
    flat_grads, _ = jax.flatten_util.ravel_pytree(grads)
    updates, new_opt_state = opt.update(flat_grads, opt_state, flat_params)
    return unravel(optax.apply_updates(flat_params, updates)), new_opt_state

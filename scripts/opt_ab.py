"""A/B the acoustic-step optimizer layout on the real chip.

flat  : current production path — ravel_pytree params+grads to one vector
        per module, fused adam, unravel back (optim.apply_updates).
tree  : plain optax.adamw leaf-wise over the param tree — no ravel/unravel
        data movement, at the cost of per-leaf update kernels.

The round-2 flat design was motivated by a measured "~4 s/step per-leaf
adam", later found to be a relay-transfer artifact (profile_parts
device_put fix).  The round-3 device trace shows ~2 s/step of async DMA
matching ravel/unravel volume, so: measure both, same shapes as bench.py.

Usage: python scripts/opt_ab.py [--batch 8] [--frames 460]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(b: int, frames: int, tokens: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stylish_tts_tpu.config import Config, ModelConfig
    from stylish_tts_tpu.models import build_models
    from stylish_tts_tpu.train.init import (
        build_train_state, init_model_variables, init_slm_params,
    )
    from stylish_tts_tpu.train.stages import (
        STAGES, StageContext, make_train_step,
    )
    from stylish_tts_tpu.train.state import restrict_state

    mc = ModelConfig()
    models = build_models(mc)
    variables = init_model_variables(models, mc, jax.random.PRNGKey(0))
    state = build_train_state(variables, mc)
    sdef = STAGES["acoustic"]
    state = restrict_state(
        state,
        set(sdef.train_models) | set(sdef.eval_models)
        | set(sdef.discriminators),
    )
    ctx = StageContext(
        models=models, model_config=mc, config=Config(),
        mel_mean=-4.0, mel_std=4.0, step_limit=10000,
        duration_class_weight=jnp.ones((16,)),
    )
    frozen = {"slm": init_slm_params(jax.random.PRNGKey(7), mc), "ssl": None}

    t = tokens
    rng = np.random.default_rng(0)
    align = np.zeros((b, t, frames), np.float32)
    bounds = np.linspace(0, frames, t + 1).astype(int)
    for j in range(t):
        align[:, j, bounds[j]:bounds[j + 1]] = 1.0
    batch = dict(
        text=jnp.asarray(rng.integers(1, 100, (b, t)), jnp.int32),
        text_length=jnp.full((b,), t, jnp.int32),
        alignment=jnp.asarray(align),
        pitch=jnp.asarray(120.0 + 30 * rng.random((b, frames)), jnp.float32),
        audio_gt=jnp.asarray(
            0.1 * rng.standard_normal((b, frames * mc.hop_length)),
            jnp.float32,
        ),
    )
    return ctx, state, batch, frozen, make_train_step


def time_step(step, state, batch, frozen, iters=6):
    import jax

    key = jax.random.PRNGKey(1)
    state, m = step(state, batch, key, frozen)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub, frozen)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=460)
    ap.add_argument("--tokens", type=int, default=192)
    ap.add_argument("--layouts", default="flat,tree")
    args = ap.parse_args()

    import jax

    from stylish_tts_tpu.train import optim

    out = {}
    for layout in args.layouts.split(","):
        optim.set_layout(layout)
        ctx, state, batch, frozen, make_train_step = build(
            args.batch, args.frames, args.tokens
        )
        # rebuild opt states in the requested layout
        from stylish_tts_tpu.train.optim import init_opt_states
        state = state.replace(opt_states=init_opt_states(state.params))
        step = jax.jit(
            make_train_step("acoustic", ctx, 1e-4), donate_argnums=(0,)
        )
        dt = time_step(step, state, batch, frozen)
        out[layout + "_step_s"] = round(dt, 4)
        sys.stderr.write(f"{layout}: {dt:.4f} s/step\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

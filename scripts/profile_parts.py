"""Decompose the acoustic train step: full-loss grad vs optimizer vs total.

profile_step.py showed the model forward/backward, spectral chain, SLM and
MRD forwards together account for ~0.13 s of the 0.85 s step; this script
pins down the rest by timing (a) value_and_grad of the COMPLETE loss_fn
(all losses incl. GAN), (b) the per-module AdamW updates alone, and
(c) the full donated step, at the bench shape.

Usage: python scripts/profile_parts.py [--batch 8] [--frames 460]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, iters=6):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=460)
    ap.add_argument("--tokens", type=int, default=192)
    ap.add_argument("--precision", choices=["no", "bf16"], default="bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stylish_tts_tpu.config import Config, ModelConfig
    from stylish_tts_tpu.models import build_models
    from stylish_tts_tpu.train.init import (
        build_train_state, init_model_variables, init_slm_params,
    )
    from stylish_tts_tpu.train.optim import apply_updates
    from stylish_tts_tpu.train.stages import (
        STAGES, StageContext, make_train_step,
    )
    from stylish_tts_tpu.train.state import restrict_state
    from stylish_tts_tpu.train import stages as S

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
    cfg = Config()
    cfg.training.mixed_precision = args.precision
    ctx = StageContext(
        models=models, model_config=mc, config=cfg,
        mel_mean=-4.0, mel_std=4.0, step_limit=10000,
        duration_class_weight=jnp.ones((16,)),
    )
    frozen = {"slm": init_slm_params(jax.random.PRNGKey(7), mc), "ssl": None}

    b, t, frames = args.batch, args.tokens, args.frames
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
            0.1 * rng.standard_normal((b, frames * mc.hop_length)), jnp.float32
        ),
    )
    key = jax.random.PRNGKey(1)
    # init happens on the CPU backend — move everything device-side ONCE,
    # or every timed call re-uploads the param tree through the relay
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    frozen = jax.device_put(frozen, dev)
    batch = jax.device_put(batch, dev)
    report = {"batch": b, "frames": frames, "precision": args.precision}

    def note():
        sys.stderr.write("partial: " + json.dumps(report) + "\n")
        sys.stderr.flush()

    rngs = {"dropout": key, "sample": key}

    # (a) value_and_grad of the complete acoustic loss incl. the GAN pair
    stage = STAGES["acoustic"]
    train_params = {k: state.params[k] for k in stage.train_models}
    frozen_params = {
        k: v for k, v in state.params.items()
        if k not in stage.train_models
    }

    import dataclasses
    import functools
    import math

    @functools.partial(jax.jit, donate_argnums=())
    def grads_only(allp, fz):
        sctx = dataclasses.replace(ctx, slm_params=fz["slm"])

        def loss_fn(p):
            tp = {k: p[k] for k in stage.train_models}
            params = {**frozen_params, **tp}
            metrics, disc_inputs, aux = stage.compute_losses(
                sctx, params, state.batch_stats, batch, rngs, state
            )
            from stylish_tts_tpu import losses as L
            from stylish_tts_tpu.train.loss_log import backwards_loss

            t_fft, p_fft = disc_inputs
            g_rs, g_gs, g_rf, g_gf = ctx.models["mrd"].apply(
                {"params": jax.tree_util.tree_map(
                    jax.lax.stop_gradient, p["mrd"])}, t_fft, p_fft
            )
            gen_loss = L.generator_adversarial_loss(g_rs, g_gs, g_rf, g_gf)
            metrics = dict(metrics)
            metrics["generator"] = gen_loss
            return backwards_loss(metrics, ctx.weights)

        allp = dict(allp)
        allp["mrd"] = state.params["mrd"]
        return jax.grad(loss_fn)(allp)

    report["grads_s"] = round(
        timeit(lambda: grads_only(train_params, frozen)["speech_predictor"]), 4
    )
    note()

    # (b) optimizer alone: per-module flat AdamW at fixed grads
    g = grads_only(train_params, frozen)

    @jax.jit
    def opt_only(params, grads_, opt_states):
        out = {}
        for k in stage.train_models:
            out[k] = apply_updates(
                params[k], grads_[k], opt_states[k], 1e-4
            )[0]
        return out

    opt_states = {k: state.opt_states[k] for k in stage.train_models}
    g = jax.device_put(g, dev)
    report["optimizer_s"] = round(
        timeit(lambda: opt_only(train_params, g, opt_states)), 4
    )
    note()

    # (c) full donated step (bench harness)
    step = jax.jit(make_train_step("acoustic", ctx, 1e-4),
                   donate_argnums=(0,))
    st = state
    st, m = step(st, batch, key, frozen)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    iters = 6
    for _ in range(iters):
        st, m = step(st, batch, key, frozen)
    jax.block_until_ready(m["loss"])
    report["full_step_s"] = round((time.perf_counter() - t0) / iters, 4)
    note()
    print(json.dumps(report))


if __name__ == "__main__":
    main()

"""Device-time profile of the acoustic train step via jax.profiler +
tensorboard_plugin_profile: where do the 0.73 s actually go, by op.

Captures an xplane trace of a few donated steps at the bench shape and
prints the framework-op table (self time, category) so optimization
targets are measured, not guessed.

Usage: python scripts/profile_trace.py [--batch 8] [--frames 460]
       [--precision bf16] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=460)
    ap.add_argument("--tokens", type=int, default=192)
    ap.add_argument("--precision", choices=["no", "bf16"], default="bf16")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--parse-only", default=None,
                    help="skip capture; parse this existing trace dir")
    args = ap.parse_args()

    import os

    # tensorboard_plugin_profile ships pre-protobuf-4 generated code
    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python"
    )
    if args.parse_only:
        _parse(args.parse_only, args.top)
        return

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
    cfg = Config()
    cfg.training.mixed_precision = args.precision
    ctx = StageContext(
        models=models, model_config=mc, config=cfg,
        mel_mean=-4.0, mel_std=4.0, step_limit=10000,
        duration_class_weight=jnp.ones((16,)),
    )
    frozen = {"slm": init_slm_params(jax.random.PRNGKey(7), mc), "ssl": None}
    # init runs on host CPU (train/init.py): put state+frozen on the
    # device ONCE — leaving them on CPU would re-transfer ~0.9 GB
    # through the relay on every call and corrupt the timing
    state, frozen = jax.device_put((state, frozen), jax.devices()[0])

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
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    frozen = jax.device_put(frozen, dev)
    batch = jax.device_put(batch, dev)

    step = jax.jit(make_train_step("acoustic", ctx, 1e-4),
                   donate_argnums=(0,))
    state, m = step(state, batch, key, frozen)
    jax.block_until_ready(m["loss"])
    state, m = step(state, batch, key, frozen)
    jax.block_until_ready(m["loss"])

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="jax_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, m = step(state, batch, key, frozen)
        jax.block_until_ready(m["loss"])
    sys.stderr.write(f"trace in {trace_dir}\n")

    _parse(trace_dir, args.top)


def _parse(trace_dir: str, top: int) -> None:
    xplanes = glob.glob(
        f"{trace_dir}/**/*.xplane.pb", recursive=True
    )
    if not xplanes:
        print(json.dumps({"error": "no xplane captured",
                          "trace_dir": trace_dir}))
        return

    # direct wire-format parse (the image's tensorboard_plugin_profile
    # pywrap bridge is built against a different TF and cannot decode
    # xplanes)
    from xplane_parse import aggregate

    print(json.dumps(aggregate(trace_dir, top), indent=1))


if __name__ == "__main__":
    main()

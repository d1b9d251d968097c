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
import gzip
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "framework_op_stats^", {}
    )
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    # framework_op_stats is JSON: rows of op stats
    try:
        table = json.loads(data)
    except json.JSONDecodeError:
        # fall back: print raw head for manual inspection
        print(data[:4000])
        return
    print(json.dumps(table)[:200])
    # normalise: gviz table format {cols:[...], rows:[{c:[{v:..}]}]}
    def rows_of(tbl):
        cols = [c.get("label") or c.get("id") for c in tbl["cols"]]
        for r in tbl["rows"]:
            yield dict(zip(cols, [c.get("v") for c in r["c"]]))

    tbls = table if isinstance(table, list) else [table]
    for tbl in tbls:
        if not isinstance(tbl, dict) or "cols" not in tbl:
            continue
        rows = list(rows_of(tbl))
        rows.sort(key=lambda r: -(r.get("Total self-time (us)")
                                  or r.get("total_self_time_us") or 0))
        out = []
        for r in rows[: top]:
            out.append({k: r.get(k) for k in list(r)[:8]})
        print(json.dumps(out, indent=1)[:8000])
        break


if __name__ == "__main__":
    main()

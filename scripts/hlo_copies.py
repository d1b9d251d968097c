"""Attribute the train step's data-movement time to HLO copy/slice ops.

The r5 device trace showed ~69% of acoustic-step device time in
`async-copy` and ~11% in `slice` (scripts/profile_trace.py) — layout
conversions, not compute.  This dumps the optimized HLO of the jitted
train step and aggregates `copy`/`copy-start`/`slice`/`transpose` ops by
shape+layout so the copies can be traced back to the producing module
and designed away.

Usage: python scripts/hlo_copies.py [--batch 8] [--frames 460]
       [--out /tmp/step_hlo.txt] [--top 25]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def nbytes(shape: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    dt, dims = m.groups()
    sizes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
             "f16": 2, "s8": 1, "u8": 1, "f64": 8, "c64": 8, "s64": 8}
    n = sizes.get(dt, 4)
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n


def analyze(text: str, top: int) -> dict:
    # optimized HLO lines look like:
    #   %copy.1 = bf16[8,257,2761,32]{3,2,1,0:T(8,128)(2,1)} copy(%op)
    pat = re.compile(
        r"=\s*([\w\[\],\d]+)(\{[^}]*\})?\s+"
        r"(copy-start|copy-done|copy|slice|transpose|dynamic-slice)\("
    )
    agg = defaultdict(lambda: [0, 0])
    totals = defaultdict(lambda: [0, 0])
    for line in text.splitlines():
        m = pat.search(line)
        if not m:
            continue
        shape, layout, op = m.group(1), m.group(2) or "", m.group(3)
        if op == "copy-done":
            continue  # counted at copy-start
        b = nbytes(shape)
        key = f"{op} {shape}{layout}"
        agg[key][0] += 1
        agg[key][1] += b
        totals[op][0] += 1
        totals[op][1] += b
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])[:top]
    return {
        "totals_by_op": {
            k: {"count": v[0], "gbytes": round(v[1] / 1e9, 3)}
            for k, v in sorted(totals.items(), key=lambda kv: -kv[1][1])
        },
        "top_shapes": [
            {"op_shape": k, "count": v[0], "gbytes": round(v[1] / 1e9, 3)}
            for k, v in rows
        ],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=460)
    ap.add_argument("--tokens", type=int, default=192)
    ap.add_argument("--out", default="/tmp/step_hlo.txt")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--parse-only", default=None)
    args = ap.parse_args()

    if args.parse_only:
        print(json.dumps(
            analyze(Path(args.parse_only).read_text(), args.top), indent=1
        ))
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
    compiled = jax.jit(
        make_train_step("acoustic", ctx, 1e-4), donate_argnums=(0,)
    ).lower(state, batch, key, frozen).compile()
    text = compiled.as_text()
    Path(args.out).write_text(text)
    report = analyze(text, args.top)
    report["hlo_path"] = args.out
    report["hlo_mb"] = round(len(text) / 1e6, 1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

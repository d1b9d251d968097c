"""Roofline analysis of the acoustic train step on the real TPU chip.

For the full donated train step and its dominant sub-graphs this script
pulls XLA's compiled cost analysis (flops, bytes accessed), measures wall
time, and reports for each part:

  ai           = flops / bytes  (arithmetic intensity, FLOP/B)
  t_compute    = flops / peak_flops      (MXU-bound floor)
  t_memory     = bytes / hbm_bw          (HBM-bound floor)
  bound        = "compute" if ai > ridge else "memory"
  mfu          = flops / t_measured / peak_flops
  ceiling_mfu  = flops / max(t_compute, t_memory) / peak_flops
                 (the best MFU XLA's own cost model permits at this shape)

v5e: 197 TFLOP/s bf16 peak, 819 GB/s HBM -> ridge = 240 FLOP/B.

Emits ROOFLINE JSON consumed by docs/PERF.md (VERDICT r2 #1: either MFU
>= 0.20 or a committed roofline analysis proving the bound).

Usage: python scripts/roofline.py [--out ROOFLINE_r03.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK = 197e12  # bf16 FLOP/s, TPU v5e
HBM_BW = 819e9  # bytes/s, TPU v5e
RIDGE = PEAK / HBM_BW


def analyze(name, fn, args, report, iters=4, measure=True):
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    entry = {"flops_g": round(flops / 1e9, 1), "bytes_gb": round(bytes_ / 1e9, 3)}
    if bytes_:
        entry["ai_flop_per_byte"] = round(flops / bytes_, 1)
        t_c, t_m = flops / PEAK, bytes_ / HBM_BW
        entry["t_compute_ms"] = round(t_c * 1e3, 1)
        entry["t_memory_ms"] = round(t_m * 1e3, 1)
        entry["bound"] = "compute" if t_c > t_m else "memory"
        entry["ceiling_mfu"] = round(flops / max(t_c, t_m) / PEAK, 3)
    if measure:
        # time the COMPILED executable, not the eager fn — eager dispatch
        # inflates t_measured and is inconsistent with the paired XLA cost
        # model (ADVICE r3)
        out = compiled(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        entry["t_measured_ms"] = round(dt * 1e3, 1)
        entry["mfu"] = round(flops / dt / PEAK, 4)
        if bytes_:
            entry["hbm_util"] = round(bytes_ / HBM_BW / dt, 3)
    report[name] = entry
    sys.stderr.write(f"{name}: {json.dumps(entry)}\n")
    return entry


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ROOFLINE_r04.json")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=460)
    args = ap.parse_args()

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

    b, frames = args.batch, args.frames
    t = max(32, frames * 192 // 460)
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
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    frozen = jax.device_put(frozen, dev)
    batch = jax.device_put(batch, dev)
    key = jax.random.PRNGKey(1)

    report = {
        "config": {"batch": b, "frames": frames,
                   "peak_tflops": PEAK / 1e12, "hbm_gbps": HBM_BW / 1e9,
                   "ridge_flop_per_byte": round(RIDGE, 1)},
        "parts": {},
    }
    parts = report["parts"]

    # 1. full train step (donation disabled so repeated calls reuse state)
    step = make_train_step("acoustic", ctx, 1e-4)

    def full(sstate, bb, kk, fz):
        st, m = step(sstate, bb, kk, fz)
        return m["loss"]

    analyze("full_step", full, (state, batch, key, frozen), parts)

    # 2. MRD discriminator stack fwd+bwd per resolution (the trace-measured
    #    hot spot), exactly as it appears inside the step (bf16 activations)
    from stylish_tts_tpu.models.discriminator import SpecDiscriminator
    from stylish_tts_tpu.ops.multi_spectrogram import RESOLUTIONS

    audio = batch["audio_gt"]
    for i, (n_fft, hop, _win) in enumerate(RESOLUTIONS):
        fr = audio.shape[1] // hop + 1
        x = jnp.asarray(
            0.1 * rng.standard_normal((b, n_fft // 2 + 1, fr, 1)),
            jnp.bfloat16,
        )
        disc = SpecDiscriminator()
        p = disc.init(jax.random.PRNGKey(i), x[:1])["params"]

        def mrd_loss(pp, xin):
            score, fmap = disc.apply({"params": pp}, xin)
            return (jnp.sum(score.astype(jnp.float32) ** 2)
                    + sum(jnp.sum(jnp.abs(f.astype(jnp.float32)))
                          for f in fmap))

        analyze(
            f"mrd_res{i}_fwd_bwd",
            jax.value_and_grad(mrd_loss),
            (jax.device_put(p, dev), x),
            parts,
        )

    # 3. speech predictor (generator side) fwd+bwd — the synthesis model
    sp = ctx.models["speech_predictor"]
    spp = {"params": state.params["speech_predictor"]}

    def sp_loss(pp):
        pred = sp.apply(
            {"params": pp}, batch["text"], batch["text_length"],
            batch["alignment"], batch["pitch"],
            jnp.ones((b, frames)), audio_gt=batch["audio_gt"],
            rngs={"sample": key, "dropout": key},
        )
        return jnp.sum(jnp.abs(pred.audio))

    analyze("speech_predictor_fwd_bwd", jax.grad(sp_loss),
            (spp["params"],), parts)

    # roofline summary: where does the ceiling sit for the whole step if
    # every part hit its own XLA-cost-model floor?
    fs = parts["full_step"]
    report["summary"] = {
        "measured_step_ms": fs.get("t_measured_ms"),
        "measured_mfu": fs.get("mfu"),
        "xla_floor_ms": max(fs["t_compute_ms"], fs["t_memory_ms"]),
        "xla_ceiling_mfu": fs["ceiling_mfu"],
        "bound": fs["bound"],
        "note": (
            "ceiling_mfu is the MFU if the step ran exactly at the XLA "
            "cost-model roofline at these shapes; the gap between mfu and "
            "ceiling_mfu is scheduling/layout loss (C=32 lane padding in "
            "the MRD stack, stride-2 conv gather, relay dispatch)."
        ),
    }
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report["summary"]))


if __name__ == "__main__":
    main()

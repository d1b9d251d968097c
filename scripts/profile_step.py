"""Per-component timing of the acoustic train step on the current backend.

VERDICT weak-3 follow-up: attributes step wall time to the model forward,
forward+backward, the spectral chain, the SLM loss, and the MRD
discriminator, so the top cost is identified by measurement rather than
guesswork.  Prints one JSON line with seconds per section at the bench
shape (batch 8, 460 frames ≈ 5.75 s audio per sample).

Usage:  python scripts/profile_step.py [--batch 8] [--frames 460]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, iters=6, **kwargs):
    import jax

    out = fn(*args, **kwargs)  # warm-up / compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=460)
    ap.add_argument("--tokens", type=int, default=192)
    ap.add_argument(
        "--precision", choices=["no", "bf16"], default="bf16",
        help="mixed_precision mode for the profiled step",
    )
    ap.add_argument(
        "--sections", default="all",
        help="comma list: full,speech,spec,slm,mrd (default all)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stylish_tts_tpu.config import Config, ModelConfig
    from stylish_tts_tpu.models import build_models
    from stylish_tts_tpu.ops.multi_spectrogram import MultiSpectrogram
    from stylish_tts_tpu.train.init import (
        build_train_state,
        init_model_variables,
        init_slm_params,
    )
    from stylish_tts_tpu.train.stages import (
        STAGES,
        StageContext,
        make_train_step,
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
    sections = set(args.sections.split(","))
    if "all" in sections:
        sections = {"full", "speech", "spec", "slm", "mrd"}
    report = {"backend": jax.devices()[0].platform,
              "batch": b, "frames": frames,
              "precision": args.precision}

    def note():  # progress to stderr: late failures keep earlier numbers
        sys.stderr.write("partial: " + json.dumps(report) + "\n")
        sys.stderr.flush()

    # 1. full train step
    if "full" in sections:
        step = jax.jit(make_train_step("acoustic", ctx, 1e-4))
        report["full_step_s"] = round(
            timeit(lambda: step(state, batch, key, frozen)[1]["loss"]), 4
        )
        note()
    if sections == {"full"}:
        print(json.dumps(report))
        return

    sp = models["speech_predictor"]
    rngs = {"dropout": key, "sample": key}

    def sp_apply(p):
        # route through ctx.apply so the section matches the train step's
        # precision policy (bf16 casts under mixed precision)
        return ctx.apply(
            "speech_predictor", {"speech_predictor": p}, None,
            batch["text"], batch["text_length"],
            batch["alignment"], batch["pitch"],
            jnp.ones((b, frames)), batch["audio_gt"],
            rngs=rngs, train=True,
        )

    # 2. speech_predictor forward alone
    @jax.jit
    def sp_fwd():
        return sp_apply(state.params["speech_predictor"]).audio

    if "speech" in sections:
        report["speech_fwd_s"] = round(timeit(sp_fwd), 4)
        note()

        # 3. speech_predictor forward+backward (dummy scalar loss)
        @jax.jit
        def sp_fwd_bwd():
            def loss_fn(p):
                return jnp.sum(jnp.abs(sp_apply(p).audio))

            return jax.grad(loss_fn)(state.params["speech_predictor"])

        report["speech_fwd_bwd_s"] = round(timeit(sp_fwd_bwd), 4)
        note()

    # 4. spectral chain: 3-resolution multi-spectrogram of GT+pred
    mspec = MultiSpectrogram(mc.sample_rate)
    pred_audio = sp_fwd()

    if "spec" in sections:
        @jax.jit
        def spec():
            return mspec(target=batch["audio_gt"], pred=pred_audio)[0]

        report["multi_spectrogram_s"] = round(timeit(spec), 4)
        note()

    # 5. SLM (WavLM) loss forward.  slm params ride as a jit ARGUMENT —
    # closing over the concrete arrays embeds them as HLO literals, and
    # the 94M-param WavLM blows the remote-compile request limit.
    if "slm" in sections:
        @jax.jit
        def slm(slm_p):
            import dataclasses

            c = dataclasses.replace(ctx, slm_params=slm_p)
            return c.slm_loss(batch["audio_gt"], pred_audio)

        report["slm_loss_s"] = round(timeit(slm, frozen["slm"]), 4)
        note()

    # 6. MRD discriminator forward on the raw FFT lists
    if "mrd" in sections:
        specs = mspec(target=batch["audio_gt"], pred=pred_audio)
        t_fft, p_fft = specs[4], specs[5]

        @jax.jit
        def mrd():
            return models["mrd"].apply(
                {"params": state.params["mrd"]}, t_fft, p_fft
            )[0][0]

        report["mrd_fwd_s"] = round(timeit(mrd), 4)
        note()

    print(json.dumps(report))


if __name__ == "__main__":
    main()

"""Benchmark: single-chip synthesis RTF + train-step and precache throughput.

Prints ONE JSON line with the headline metric:
  {"metric": "synthesis_rtf", "value": <audio-seconds generated per
   wall-second per chip>, "unit": "x_realtime", "vs_baseline": value / 5.0,
   ...extra measured configs from BASELINE.md...}

The baseline target is >=5x real time per TPU v5e chip on LJSpeech-length
utterances (BASELINE.md).  Uses the full-size default model (model.yml
parity) with randomly initialised weights — throughput is weight-independent.

Robustness: the TPU backend is reachable through a remote relay that can be
transiently down (round 1 lost its bench to an outage) — so the backend is
probed with retry/backoff in subprocesses first, each sub-benchmark runs in
its own subprocess under a timeout, and the CUMULATIVE partial JSON line is
printed after EVERY sub-benchmark (last line wins) so a driver timeout mid-run
still captures everything measured so far (round 3 lost its bench to an
all-or-nothing print).  Sub-benchmarks run headline-first.
"""

import json
import os
import subprocess
import sys
import time

V5E_BF16_PEAK_FLOPS = 197e12  # per-chip bf16 peak, TPU v5e


def peak_flops(device) -> float:
    """Per-chip bf16 peak for the chip the bench actually lands on.
    BENCH_r04 reported MFU 0.43 at a step time 5.4x faster than the same
    code measures on v5e — consistent with the driver chip being a later
    generation while MFU divided by the v5e constant; record the device
    kind and normalise by ITS peak so the artifact is self-describing."""
    kind = getattr(device, "device_kind", "").lower()
    table = [
        ("v6", 918e12), ("v5 lite", 197e12), ("v5e", 197e12),
        ("v5p", 459e12), ("v5", 459e12), ("v4", 275e12), ("v3", 123e12),
    ]
    for key, val in table:
        if key in kind:
            return val
    return V5E_BF16_PEAK_FLOPS

BACKEND_RETRIES = 3
BACKEND_BACKOFF_S = 20  # grows 1.5x per attempt


def probe_backend() -> bool:
    """Retry backend init in fresh subprocesses (a failed in-process init
    can be cached by jax) until the relay answers or retries run out."""
    delay = BACKEND_BACKOFF_S
    for attempt in range(BACKEND_RETRIES):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=120,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        sys.stderr.write(
            f"backend probe {attempt + 1}/{BACKEND_RETRIES} failed; "
            f"retrying in {delay:.0f}s\n"
        )
        time.sleep(delay)
        delay = min(delay * 1.5, 60)
    return False


def run_sub(name: str, timeout: float) -> dict:
    """Run `python bench.py --sub name` and parse its JSON line."""
    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sub", name],
            capture_output=True, timeout=timeout, text=True,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:] + "\n")
            return {"error": f"{name}: rc={r.returncode}"}
        out = json.loads(r.stdout.strip().splitlines()[-1])
        out[f"{name}_elapsed_s"] = round(time.perf_counter() - t0, 1)
        return out
    except subprocess.TimeoutExpired as exc:
        err = exc.stderr
        if err:
            if isinstance(err, bytes):
                err = err.decode(errors="replace")
            sys.stderr.write(err[-2000:] + "\n")
        return {"error": f"{name}: timeout after {timeout:.0f}s"}
    except Exception as exc:  # noqa: BLE001
        return {"error": f"{name}: {exc}"}


# --------------------------------------------------------------------- #
# Sub-benchmarks (each runs in its own process)
# --------------------------------------------------------------------- #


def bench_synthesis() -> dict:
    import jax
    import numpy as np

    from stylish_tts_tpu.config import ModelConfig
    from stylish_tts_tpu.export.infer import Synthesizer
    from stylish_tts_tpu.models import build_models
    from stylish_tts_tpu.train.init import init_model_variables

    mc = ModelConfig()
    models = build_models(mc)
    rng = jax.random.PRNGKey(0)
    keys = [
        "speech_predictor",
        "pe_text_encoder",
        "pe_text_style_encoder",
        "pitch_energy_predictor",
        "duration_predictor",
    ]
    variables = init_model_variables(models, mc, rng, keys=keys)
    params = {k: v["params"] for k, v in variables.items()}
    synth = Synthesizer(mc, params)

    # LJSpeech-like utterance: ~6.5 s of IPA phonemes (~130 tokens)
    phonemes = (
        "ðə bˈɜːdz wɜː sˈɪŋɪŋ swˈiːtli ɪn ðə ɡˈɑːɹdən wˌaɪl ðə tʃˈɪldɹən "
        "plˈeɪd bɪnˈiːθ ðə tˈɔːl ˈoʊk tɹˈiː ɑːn ðæt wˈɔːɹm sˈʌmɚ ˈæftɚnˌuːn"
    )
    # untrained duration weights predict absurd lengths; pin a natural
    # speaking rate (4 mel frames = 50 ms per phoneme -> ~6.7 s utterance)
    # while still timing the duration graph.
    DUR = 4
    iters = 10

    audio = synth.synthesize(phonemes, fixed_duration=DUR)  # warm-up
    jax.block_until_ready(audio)
    t0 = time.perf_counter()
    total_audio = 0.0
    for _ in range(iters):
        audio = synth.synthesize(phonemes, fixed_duration=DUR)
        total_audio += audio.shape[0] / mc.sample_rate
    single_rtf = total_audio / (time.perf_counter() - t0)

    batched = {}
    for b in (16, 32):
        batch = [phonemes] * b
        synth.synthesize_batch(batch, fixed_duration=DUR)  # warm-up
        t0 = time.perf_counter()
        total_audio = 0.0
        for _ in range(iters):
            outs = synth.synthesize_batch(batch, fixed_duration=DUR)
            total_audio += sum(o.shape[0] for o in outs) / mc.sample_rate
        batched[b] = total_audio / (time.perf_counter() - t0)

    # pipelined serving loop: dispatch batch i+1 while batch i's PCM
    # streams back to the host (async jax dispatch)
    b = 32
    batch = [phonemes] * b
    synth.synthesize_batch(batch, fixed_duration=DUR)  # warm-up
    t0 = time.perf_counter()
    total_audio = 0.0
    pending = None
    for _ in range(iters):
        nxt = synth.synthesize_batch_async(batch, fixed_duration=DUR)
        if pending is not None:
            audio, totals = pending
            np.asarray(audio)
            total_audio += sum(totals) * mc.hop_length / mc.sample_rate
        pending = nxt
    audio, totals = pending
    np.asarray(audio)
    total_audio += sum(totals) * mc.hop_length / mc.sample_rate
    pipelined_rtf = total_audio / (time.perf_counter() - t0)

    return {
        "single_stream_rtf": round(single_rtf, 3),
        "batched_rtf_b16": round(batched[16], 3),
        "batched_rtf_b32": round(batched[32], 3),
        "pipelined_rtf_b32": round(pipelined_rtf, 3),
    }


def bench_train_step(b: int = 8, frames: int = 460, tag: str = "") -> dict:
    """Acoustic-stage train step throughput at full model size
    (BASELINE.md measured config: acoustic-stage train step, 1 host).
    Swept over representative (batch, frames) buckets — training spends
    time across bucket shapes, not one hand-picked one (VERDICT r2 #9)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stylish_tts_tpu.config import Config, ModelConfig
    from stylish_tts_tpu.models import build_models
    from stylish_tts_tpu.train.init import (
        build_train_state,
        init_model_variables,
        init_slm_params,
    )
    from stylish_tts_tpu.train.stages import StageContext, make_train_step

    mc = ModelConfig()
    if os.environ.get("STYLISH_MRD_PALLAS"):
        mc.mrd_pallas = True
    models = build_models(mc)
    variables = init_model_variables(models, mc, jax.random.PRNGKey(0))
    state = build_train_state(variables, mc)
    from stylish_tts_tpu.train.state import restrict_state
    from stylish_tts_tpu.train.stages import STAGES

    sdef = STAGES["acoustic"]
    state = restrict_state(
        state,
        set(sdef.train_models) | set(sdef.eval_models) | set(sdef.discriminators),
    )
    ctx = StageContext(
        models=models, model_config=mc, config=Config(),
        mel_mean=-4.0, mel_std=4.0, step_limit=10000,
        duration_class_weight=jnp.ones((16,)),
    )
    frozen = {"slm": init_slm_params(jax.random.PRNGKey(7), mc), "ssl": None}
    # init runs on host CPU (train/init.py): put state+frozen on the
    # device ONCE — leaving them on CPU would re-transfer ~0.9 GB
    # through the relay on every call and corrupt the timing
    state, frozen = jax.device_put((state, frozen), jax.devices()[0])

    t = max(32, frames * 192 // 460)  # tokens scale with utterance length
    rng = np.random.default_rng(0)
    align = np.zeros((b, t, frames), np.float32)
    bounds = np.linspace(0, frames, t + 1).astype(int)
    for j in range(t):
        align[:, j, bounds[j]:bounds[j + 1]] = 1.0
    batch = dict(
        text=jnp.asarray(rng.integers(1, 100, (b, t)), jnp.int32),
        text_length=jnp.full((b,), t, jnp.int32),
        alignment=jnp.asarray(align),
        pitch=jnp.asarray(
            120.0 + 30 * rng.random((b, frames)), jnp.float32
        ),
        audio_gt=jnp.asarray(
            0.1 * rng.standard_normal((b, frames * mc.hop_length)),
            jnp.float32,
        ),
    )
    key = jax.random.PRNGKey(1)

    # ONE donated executable serves both the flops estimate and the timed
    # loop: a second non-donated lowering cannot alias state in/out, so its
    # allocation plan needs ~2x the train state and OOM'd the b8xf700
    # compile in r4 (15.84G vs 15.75G) before the timed program ever ran.
    step = jax.jit(
        make_train_step("acoustic", ctx, 1e-4), donate_argnums=(0,)
    ).lower(state, batch, key, frozen).compile()
    try:
        flops = float(step.cost_analysis()["flops"])
    except Exception:  # noqa: BLE001
        flops = None

    state, metrics = step(state, batch, key, frozen)  # warm-up
    jax.block_until_ready(metrics["loss"])
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub, frozen)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    audio_sec = b * frames * mc.hop_length / mc.sample_rate
    dev = jax.devices()[0]
    p = f"train{tag}_"
    out = {
        p + "step_s": round(dt, 4),
        p + "audio_sec_per_s": round(audio_sec / dt, 2),
        p + "batch": b,
        p + "frames": frames,
        "device_kind": getattr(dev, "device_kind", "unknown"),
    }
    if flops:
        out[p + "step_tflops"] = round(flops / 1e12, 2)
        out[p + "mfu_est"] = round(flops / dt / peak_flops(dev), 4)
    return out


def bench_precache() -> dict:
    """Pitch + alignment precache throughput (BASELINE.md measured config:
    pitch+alignment precache) on synthetic LJSpeech-length audio."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stylish_tts_tpu.dataprep.pitch import extract_pitch_batch

    sr, hop = 24000, 300
    rng = np.random.default_rng(0)
    waves = []
    for _ in range(64):
        n = int(rng.integers(2 * sr, 8 * sr))
        t = np.arange(n) / sr
        f0 = 120 + 60 * rng.random()
        waves.append(
            (0.4 * np.sin(2 * np.pi * f0 * t)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)
        )
    audio_sec = sum(w.shape[0] for w in waves) / sr
    extract_pitch_batch(waves[:2], sr, hop)  # warm-up compile
    t0 = time.perf_counter()
    extract_pitch_batch(waves, sr, hop)
    pitch_rate = audio_sec / (time.perf_counter() - t0)

    # alignment precache kernel: aligner forward + Viterbi on one bucket
    from stylish_tts_tpu.config import ModelConfig
    from stylish_tts_tpu.models.text_aligner import TextAligner
    from stylish_tts_tpu.ops.ctc import forced_align
    from stylish_tts_tpu.ops.mel import MelSpectrogram

    mc = ModelConfig()
    aligner = TextAligner(
        n_mels=80, n_tokens=mc.text_encoder.tokens, hidden_dim=640
    )
    k = jax.random.PRNGKey(0)
    variables = aligner.init(
        {"params": k, "dropout": k}, jnp.zeros((1, 16, 80)), jnp.asarray([16])
    )
    to_mel = MelSpectrogram(
        n_mels=80, n_fft=mc.n_fft, win_length=mc.win_length,
        hop_length=mc.hop_length, sample_rate=mc.sample_rate,
    )
    B, FR, T = 16, 600, 128

    @jax.jit
    def run(wb, tb, tl, ml):
        mel = to_mel(wb)
        mel = (jnp.log(1e-5 + mel) + 4.0) / 4.0
        mel = mel[:, :-1]
        log_probs, _ = aligner.apply(variables, mel, ml)
        _, scores, states = forced_align(
            log_probs, tb, ml, tl, mc.text_encoder.tokens,
            return_states=True,
        )
        return scores, states

    wb = jnp.asarray(
        0.1 * rng.standard_normal((B, FR * hop)), jnp.float32
    )
    tb = jnp.asarray(rng.integers(1, 100, (B, T)), jnp.int32)
    tl = jnp.full((B,), T, jnp.int32)
    ml = jnp.full((B,), FR, jnp.int32)
    jax.block_until_ready(run(wb, tb, tl, ml))  # warm-up
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(wb, tb, tl, ml)
    jax.block_until_ready(out)
    align_rate = iters * B * FR * hop / sr / (time.perf_counter() - t0)
    return {
        "pitch_precache_audio_sec_per_s": round(pitch_rate, 1),
        "align_precache_audio_sec_per_s": round(align_rate, 1),
    }


# Ordered HEADLINE-FIRST: a driver timeout partway through still leaves the
# baseline-facing numbers on stdout (the cumulative JSON reprints per sub).
SUBS = {
    # budgets sum to ~3400 s — r4's 900 s-each schedule overran the
    # driver's cap (BENCH_r04 rc=124, two subs never ran).  Cold compiles
    # through the TPU relay run 5-15 min; the persistent compile cache
    # (~/.cache/jax*) makes warm reruns fast and accumulates across
    # timed-out attempts, so partial progress persists.
    "synthesis": (bench_synthesis, 800),
    # canonical bin-20 acoustic train shape (BASELINE measured config)
    "train_step": (bench_train_step, 800),
    "precache": (bench_precache, 500),
    # extra bucket shapes, each in its own subprocess so an OOM at one
    # shape doesn't void the others.  Footprint guide (dominant term =
    # MRD res-0 fmaps ~ batch*frames): b8*f460 and b8*f700 (1.5x) fit on
    # 16 GB; the wide-batch/short-utterance point keeps batch*frames <= 1.5x.
    "train_b8l": (lambda: bench_train_step(8, 700, "_b8_f700"), 700),
    "train_b16": (lambda: bench_train_step(16, 230, "_b16_f230"), 600),
}


def summarize(result: dict, errors: list) -> dict:
    rtfs = [
        result.get(k)
        for k in (
            "single_stream_rtf", "batched_rtf_b16", "batched_rtf_b32",
            "pipelined_rtf_b32",
        )
        if result.get(k)
    ]
    if rtfs:
        result["value"] = round(max(rtfs), 3)
        result["vs_baseline"] = round(result["value"] / 5.0, 3)
    mfus = [v for k, v in result.items() if k.endswith("mfu_est")]
    thr = [v for k, v in result.items() if k.endswith("audio_sec_per_s")
           and k.startswith("train")]
    if mfus:
        result["train_mfu_best"] = max(mfus)
    if thr:
        result["train_audio_sec_per_s_best"] = max(thr)
    if errors:
        result["errors"] = list(errors)
    elif "errors" in result:
        del result["errors"]
    return result


def main() -> int:
    if len(sys.argv) == 3 and sys.argv[1] == "--sub":
        fn, _ = SUBS[sys.argv[2]]
        print(json.dumps(fn()))
        return 0

    result = {
        "metric": "synthesis_rtf",
        "value": None,
        "unit": "x_realtime",
        "vs_baseline": None,
    }
    if not probe_backend():
        result["error"] = "tpu_backend_unavailable_after_retries"
        print(json.dumps(result))
        return 1

    errors = []
    any_ok = False
    for name, (_, timeout) in SUBS.items():
        sub = run_sub(name, timeout)
        if "error" in sub:
            errors.append(sub["error"])
        else:
            any_ok = True
        result.update({k: v for k, v in sub.items() if k != "error"})
        # reprint the CUMULATIVE line after every sub — last line wins, so
        # a driver timeout mid-run still captures everything so far
        print(json.dumps(summarize(result, errors)), flush=True)
    return 0 if any_ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Benchmark: single-chip synthesis throughput (real-time factor).

Prints ONE JSON line:
  {"metric": "synthesis_rtf", "value": <audio-seconds generated per
   wall-second per chip>, "unit": "x_realtime", "vs_baseline": value / 5.0}

The baseline target is >=5x real time per TPU v5e chip on LJSpeech-length
utterances (BASELINE.md).  Uses the full-size default model (model.yml
parity) with randomly initialised weights — throughput is weight-independent.
"""

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stylish_tts_tpu.config import ModelConfig
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

    from stylish_tts_tpu.export.infer import Synthesizer

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

    # ---- single-utterance latency path --------------------------------
    audio = synth.synthesize(phonemes, fixed_duration=DUR)  # warm-up
    jax.block_until_ready(audio)
    iters = 10
    t0 = time.perf_counter()
    total_audio = 0.0
    for _ in range(iters):
        audio = synth.synthesize(phonemes, fixed_duration=DUR)
        total_audio += audio.shape[0] / mc.sample_rate
    single_rtf = total_audio / (time.perf_counter() - t0)

    # ---- batched bucketed serving path (headline throughput) ----------
    batched = {}
    for b in (16, 32):
        batch = [phonemes] * b
        outs = synth.synthesize_batch(batch, fixed_duration=DUR)  # warm-up
        t0 = time.perf_counter()
        total_audio = 0.0
        for _ in range(iters):
            outs = synth.synthesize_batch(batch, fixed_duration=DUR)
            total_audio += sum(o.shape[0] for o in outs) / mc.sample_rate
        batched[b] = total_audio / (time.perf_counter() - t0)

    # ---- pipelined serving loop: dispatch batch i+1 while batch i's
    # PCM streams back to the host (async jax dispatch) ----------------
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

    rtf = max(single_rtf, *batched.values(), pipelined_rtf)
    print(
        json.dumps(
            {
                "metric": "synthesis_rtf",
                "value": round(rtf, 3),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 5.0, 3),
                "single_stream_rtf": round(single_rtf, 3),
                "batched_rtf_b16": round(batched[16], 3),
                "batched_rtf_b32": round(batched[32], 3),
                "pipelined_rtf_b32": round(pipelined_rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())

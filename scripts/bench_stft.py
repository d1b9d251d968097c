"""Microbenchmark: Pallas frame-assembly STFT vs the conv/matmul STFT at
the production resolutions (generator head 2048/75 at hop/4 after the
x4 upsample, and the 3 multi-spectrogram resolutions), on the current
backend.  Prints one JSON line of microseconds per call.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, iters=20):
    import jax

    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stylish_tts_tpu.ops.stft import stft
    from stylish_tts_tpu.ops.stft_pallas import stft_pallas

    on_tpu = jax.devices()[0].platform != "cpu"
    rng = np.random.default_rng(0)
    b, sec, sr = 8, 5.75, 24000
    x = jnp.asarray(rng.standard_normal((b, int(sec * sr))), jnp.float32)

    cases = [
        ("gen_head_2048_75", 2048, 75, 2048),
        ("mspec_512_50", 512, 50, 240),
        ("mspec_1024_120", 1024, 120, 600),
        ("mspec_2048_240", 2048, 240, 1200),
    ]
    report = {"backend": jax.devices()[0].platform, "batch": b,
              "audio_s": sec}
    for name, n_fft, hop, win in cases:
        conv = jax.jit(
            lambda x, n=n_fft, h=hop, w=win: stft(
                x, n_fft=n, hop_length=h, win_length=w
            )[0]
        )
        report[f"{name}_conv_us"] = round(1e6 * timeit(lambda: conv(x)), 1)
        if on_tpu:
            pal = jax.jit(
                lambda x, n=n_fft, h=hop, w=win: stft_pallas(
                    x, n_fft=n, hop_length=h, win_length=w
                )[0]
            )
            try:
                # numerical agreement first
                a = conv(x)
                p = pal(x)
                err = float(jnp.max(jnp.abs(a - p)))
                report[f"{name}_pallas_us"] = round(
                    1e6 * timeit(lambda: pal(x)), 1
                )
                report[f"{name}_max_abs_err"] = err
            except Exception as exc:  # noqa: BLE001
                report[f"{name}_pallas_error"] = str(exc)[:200]
    print(json.dumps(report))


if __name__ == "__main__":
    main()

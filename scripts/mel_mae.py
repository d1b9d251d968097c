"""Publish the end-to-end mel-MAE parity number (BASELINE.md target:
mel MAE < 1e-3 vs the torch reference).  Measurement lives in
tests/e2e_mel_mae.py — this entry point prints one JSON line.

--backend cpu (default): jax side runs on host CPU (torch-CPU vs jax-CPU).
--backend tpu: jax side runs on the real TPU backend (torch-CPU vs
  jax-TPU) — the production-hardware parity number (VERDICT r4 #7).
"""

import argparse
import json
import sys
from pathlib import Path

ap = argparse.ArgumentParser()
ap.add_argument("--backend", choices=["cpu", "tpu"], default="cpu")
args = ap.parse_args()

import jax  # noqa: E402

if args.backend == "cpu":
    # parity vs torch-CPU is a CPU measurement; the container's
    # sitecustomize pins the remote TPU backend unless overridden here
    # (the JAX_PLATFORMS env var is ignored)
    jax.config.update("jax_platforms", "cpu")

_root = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_root))
sys.path.insert(0, str(_root / "tests"))

from e2e_mel_mae import measure_e2e_mel_mae  # noqa: E402

if __name__ == "__main__":
    mel_mae, log_mel_mae, audio_mae = measure_e2e_mel_mae()
    print(json.dumps({
        "metric": "e2e_mel_mae_vs_torch",
        "backend": args.backend,
        "value": mel_mae,
        "unit": "log1p_mel_magnitude_abs_err",
        "target": 1e-3,
        "log_mel_mae": log_mel_mae,
        "audio_mae": audio_mae,
    }))

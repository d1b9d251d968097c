"""Measure YIN vs YIN+StoneMask-style-refinement cents error on the
speech-like synthetic suite (VERDICT r3 #6: a recorded cents-error number
in the repo, and an IF refinement pass on the YIN output).

Ground truth comes from the signal generator itself (harmonic stacks with
vibrato/jitter/declination under formant envelopes, fricatives, silence —
tests/test_pitch_quality.py:make_speechlike), so the error is measured
against KNOWN truth rather than another estimator.  The reference's
pyworld Harvest+StoneMask C++ stack is not installable in this image; the
refinement pass implemented in stylish_tts_tpu/dataprep/pitch.py is the
StoneMask analogue (instantaneous frequency from windowed harmonic
correlations).

Usage: python scripts/pitch_eval.py [--out PITCH_r04.json] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def score(est_list, gt_list):
    import numpy as np

    cents_errs = []
    tp = fp = fn = 0
    for e, gt in zip(est_list, gt_list):
        m = min(len(e), len(gt))
        e, gt = e[:m], gt[:m]
        tp += int(((e > 0) & (gt > 0)).sum())
        fp += int(((e > 0) & (gt == 0)).sum())
        fn += int(((e == 0) & (gt > 0)).sum())
        both = (e > 0) & (gt > 0)
        if both.any():
            cents_errs.append(np.abs(1200 * np.log2(e[both] / gt[both])))
    cents = np.concatenate(cents_errs)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return {
        "cents_mae": round(float(cents.mean()), 2),
        "cents_p95": round(float(np.percentile(cents, 95)), 2),
        "gross_error_rate": round(float((cents > 100).mean()), 5),
        "vuv_f1": round(
            2 * precision * recall / max(precision + recall, 1e-9), 4
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--utts", type=int, default=16)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_pitch_quality import make_speechlike

    from stylish_tts_tpu.dataprep.pitch import extract_pitch_batch

    rng = np.random.default_rng(42)
    waves, gts = [], []
    for _ in range(args.utts):
        w, f0, _ = make_speechlike(rng, f0_base=float(rng.uniform(90, 260)))
        waves.append(w)
        gts.append(f0)

    raw = extract_pitch_batch(waves, 24000, 300, refine=False)
    ref = extract_pitch_batch(waves, 24000, 300, refine=True)
    report = {
        "suite": f"{args.utts} speech-like utterances (vibrato, jitter, "
                 "declination, formants, fricatives; known-truth F0)",
        "yin_raw": score(raw, gts),
        "yin_stonemask_refined": score(ref, gts),
    }
    print(json.dumps(report))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Train the alignment and acoustic stages for a few hundred REAL steps
and record the loss curves (VERDICT r2 #3: prove training works beyond a
2-step dryrun — losses descend, the GAN stays stable, the gap-aware disc
LR keeps the discriminator in band).

Runs the production train_model on a generated sine-speech dataset at the
FULL default model size, captures the per-step log lines (log_interval=1)
and emits TRAINCURVE JSON: {stage: [{step, loss, ...per-loss terms}]}.

Usage:
  python scripts/train_curve.py [--steps 300] [--out TRAINCURVE_r03.json]
          [--stages alignment,acoustic] [--utts 48]
"""

from __future__ import annotations

import argparse
import json
import logging
import re
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LINE = re.compile(r"\[(\w+)\] epoch (\d+) step (\d+) loss: ([\d.eE+-]+)(.*)")
TERM = re.compile(r"(\w+): ([\d.eE+-]+)")


class CurveCapture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.curves: dict = {}

    def emit(self, record):
        m = LINE.search(record.getMessage())
        if not m:
            return
        stage, _epoch, step, loss, rest = m.groups()
        entry = {"step": int(step), "loss": float(loss)}
        for k, v in TERM.findall(rest):
            entry[k] = float(v)
        self.curves.setdefault(stage, []).append(entry)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="TRAINCURVE_r05.json")
    ap.add_argument("--stages", default="alignment,acoustic")
    ap.add_argument("--utts", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=7.0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model for CPU smoke runs of this harness")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    if "," in args.stages:
        # one SUBPROCESS per stage: each stage then owns a clean device
        # (no resident programs/buffers from the previous stage) and a
        # relay fault in one stage cannot void the other's curve
        import subprocess

        merged = {"steps": args.steps, "utts": args.utts, "curves": {}}
        for st in args.stages.split(","):
            part = f"{args.out}.{st}.part"
            cmd = [sys.executable, __file__, "--steps", str(args.steps),
                   "--stages", st, "--utts", str(args.utts),
                   "--seconds", str(args.seconds), "--out", part]
            if args.tiny:
                cmd.append("--tiny")
            if args.cpu:
                cmd.append("--cpu")
            rc = subprocess.run(cmd).returncode
            try:
                sub = json.loads(Path(part).read_text())
                merged["curves"].update(sub.get("curves", {}))
                merged.update({k: v for k, v in sub.items()
                               if k not in ("curves", "steps", "utts")})
            except (OSError, ValueError):
                pass
            if rc != 0:
                merged[f"{st}_error"] = f"rc={rc}"
            Path(args.out).write_text(json.dumps(merged))
        print(json.dumps({k: v for k, v in merged.items() if k != "curves"}))
        return 0

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from stylish_tts_tpu.config import Config, ModelConfig
    from stylish_tts_tpu.train.loop import train_model
    from stylish_tts_tpu.utils.synthetic import make_synthetic_dataset

    root = Path(tempfile.mkdtemp(prefix="traincurve_"))
    make_synthetic_dataset(root, n_segments=args.utts, seconds=args.seconds)

    config = Config()
    config.dataset.path = str(root)
    config.training.log_interval = 1
    config.training.val_interval = 10 ** 9
    config.training.save_interval = 10 ** 9
    # pin a measured-safe batch plan instead of the AOT memory planner:
    # the planner's probe+validation compiles cost ~5 relay compiles of the
    # full-size step (tens of minutes) and the curve, not peak throughput,
    # is the point here.  probe_batch_max=8 drives the heuristic plan to
    # b8-equivalent shapes, which bench.py measures as fitting at f700.
    config.training.aot_memory_plan = False
    for st in args.stages.split(","):
        config.training_plan.get_stage(st).probe_batch_max = 8

    if args.tiny:
        from stylish_tts_tpu.utils.synthetic import tiny_model_config

        mc = tiny_model_config()
    else:
        mc = ModelConfig()  # FULL default size

    capture = CurveCapture()
    logging.getLogger("stylish_tts_tpu.train.loop").addHandler(capture)
    logging.getLogger("stylish_tts_tpu.train.loop").setLevel(logging.INFO)

    report = {"steps": args.steps, "utts": args.utts,
              "curves": capture.curves}
    for stage in args.stages.split(","):
        out_dir = root / f"out_{stage}"
        train_model(
            config=config, model_config=mc, out_dir=str(out_dir),
            stage_name=stage, max_steps=args.steps,
        )
        # partial dump: a relay outage mid-run shouldn't void the
        # stages already measured
        Path(args.out).write_text(json.dumps(report))
    # summary: first/last window means + GAN band occupancy
    for stage, curve in capture.curves.items():
        if len(curve) < 8:
            continue
        k = max(4, len(curve) // 10)
        first = sum(e["loss"] for e in curve[:k]) / k
        last = sum(e["loss"] for e in curve[-k:]) / k
        report[f"{stage}_first_mean"] = round(first, 4)
        report[f"{stage}_last_mean"] = round(last, 4)
        report[f"{stage}_descended"] = bool(last < first)
        if "discriminator" in curve[-1]:
            ds = [e["discriminator"] for e in curve[len(curve) // 2:]]
            report[f"{stage}_disc_last_half_mean"] = round(
                sum(ds) / len(ds), 4
            )
    Path(args.out).write_text(json.dumps(report))
    print(json.dumps({k: v for k, v in report.items() if k != "curves"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

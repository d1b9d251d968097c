"""Data-parallel scaling efficiency benchmark.

Measures training throughput (audio-seconds/s) for the acoustic stage at
1..N devices over a jax mesh, the BASELINE 'scaling efficiency >= 0.85 at
4 hosts' config.  On a single-chip sandbox run with --virtual to validate
the sharded step over N virtual CPU devices; on a real pod slice run as-is
(per-host data sharding comes from the same code path).

Usage:
  python scripts/scaling_bench.py [--virtual N] [--steps K]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--virtual", type=int, default=0,
                        help="force N virtual CPU devices")
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--frames", type=int, default=160)
    parser.add_argument("--per-device-batch", type=int, default=2)
    parser.add_argument("--out", default=None,
                        help="write a JSON artifact to this path")
    args = parser.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from stylish_tts_tpu.config import Config, ModelConfig
    from stylish_tts_tpu.models import build_models
    from stylish_tts_tpu.parallel import (
        make_mesh, make_parallel_train_step, replicate, shard_batch,
    )
    from stylish_tts_tpu.train.init import (
        build_train_state, init_model_variables, init_slm_params,
    )
    from stylish_tts_tpu.train.stages import StageContext, make_train_step

    mc = ModelConfig()
    cfg = Config()
    models = build_models(mc)
    rng = jax.random.PRNGKey(0)
    variables = init_model_variables(models, mc, rng)
    # keep the template host-side: replicate() may alias device buffers,
    # and the donated step would delete them out from under the next mesh
    state0 = jax.device_get(build_train_state(variables, mc))
    ctx = StageContext(
        models=models, model_config=mc, config=cfg,
        mel_mean=-4.0, mel_std=4.0, step_limit=1000,
        duration_class_weight=jnp.ones((16,)),
    )
    frozen0 = jax.device_get(
        {"slm": init_slm_params(jax.random.PRNGKey(7), mc), "ssl": None}
    )

    devices = jax.devices()
    results = {}
    sizes = sorted({1, 2, 4, len(devices)} & set(range(1, len(devices) + 1)))
    for n in sizes:
        mesh = make_mesh(n)
        step = make_parallel_train_step(
            make_train_step("acoustic", ctx, 1e-4), mesh
        )
        b = n * args.per_device_batch
        t, frames = 64, args.frames
        batch = dict(
            text=jnp.zeros((b, t), jnp.int32),
            text_length=jnp.full((b,), t, jnp.int32),
            alignment=jnp.zeros((b, t, frames)).at[:, 0].set(1.0),
            pitch=jnp.full((b, frames), 120.0),
            audio_gt=jnp.asarray(
                np.random.default_rng(0).standard_normal(
                    (b, frames * mc.hop_length)
                ), jnp.float32,
            ) * 0.1,
        )
        with mesh:
            state = replicate(state0, mesh)
            sbatch = shard_batch(batch, mesh)
            frozen = replicate(frozen0, mesh)
            state, metrics = step(state, sbatch, jax.random.PRNGKey(1), frozen)
            jax.block_until_ready(metrics["loss"])  # compile
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, metrics = step(
                    state, sbatch, jax.random.PRNGKey(2 + i), frozen
                )
            jax.block_until_ready(metrics["loss"])
            wall = time.perf_counter() - t0
        audio_seconds = (
            args.steps * b * frames * mc.hop_length / mc.sample_rate
        )
        results[n] = audio_seconds / wall
        print(f"devices={n}: {results[n]:.2f} audio-sec/s")

    base = results[sizes[0]]
    efficiency = {}
    for n in sizes:
        efficiency[n] = results[n] / (base * n / sizes[0])
        print(f"scaling efficiency @ {n} devices: {efficiency[n]:.3f}")

    # analytic ICI projection for the real target (the virtual-CPU curve
    # above measures host-core contention, not the interconnect): DP cost
    # per step = ring all-reduce of the trained-module grads, overlapping
    # nothing (worst case).  v5e: 2x ICI links/chip at ~45 GB/s usable each
    # per direction; ring all-reduce moves 2*(n-1)/n * bytes per chip.
    import jax.flatten_util

    from stylish_tts_tpu.train.stages import STAGES
    from stylish_tts_tpu.train.init import build_train_state as _bts  # noqa

    sdef = STAGES["acoustic"]
    grad_bytes = 0
    for key in list(sdef.train_models) + list(sdef.discriminators):
        flat, _ = jax.flatten_util.ravel_pytree(state0.params[key])
        grad_bytes += flat.size * 4  # f32 grads
    ici_bytes_per_s = 45e9
    step_s_real = 0.75  # measured single-chip acoustic step (r3, tree opt)
    modeled = {}
    for n in (2, 4, 8, 16):
        allreduce_s = 2 * (n - 1) / n * grad_bytes / ici_bytes_per_s
        modeled[n] = step_s_real / (step_s_real + allreduce_s)
    # multi-HOST projection across slice boundaries (VERDICT r3 #9): DP
    # over S single-host v5e slices reduces grads intra-slice over ICI,
    # then all-reduces the slice partials over DCN.  Conservative DCN
    # budget ~12.5 GB/s usable per host (100 Gbps NICs); DCN bytes per
    # host per step = 2*(S-1)/S * grad_bytes.
    dcn_bytes_per_s = 12.5e9
    modeled_dcn = {}
    for s in (2, 4, 8):
        dcn_s = 2 * (s - 1) / s * grad_bytes / dcn_bytes_per_s
        modeled_dcn[s] = step_s_real / (step_s_real + dcn_s)
    artifact = {
        "mode": "virtual-cpu" if args.virtual else "device",
        "host_cores": os.cpu_count(),
        "note": (
            "MEASURED: the virtual-CPU curve only (it bounds host-core "
            "contention, NOT the interconnect — 8 virtual devices share "
            f"{os.cpu_count()} cores).  MODELED (projections, no multi-"
            "chip/multi-host hardware in this environment): "
            "modeled_ici_efficiency = ring all-reduce over v5e ICI within "
            "a slice; modeled_dcn_efficiency_hosts = DP across single-"
            "host slices with grad all-reduce over 100 Gbps DCN."
        ),
        "per_device_batch": args.per_device_batch,
        "frames": args.frames,
        "measured_throughput_audio_sec_per_s": results,
        "measured_scaling_efficiency_virtual_cpu": efficiency,
        "measured_multihost": None,
        "grad_bytes_per_step": int(grad_bytes),
        "single_chip_step_s_used_by_model": step_s_real,
        "modeled_ici_efficiency": modeled,
        "modeled_dcn_efficiency_hosts": modeled_dcn,
    }
    print(json.dumps(artifact))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)


if __name__ == "__main__":
    main()

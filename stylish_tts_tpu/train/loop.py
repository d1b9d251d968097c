"""Training driver: multi-stage auto-advancing loop.

Parity with train_model / train_val_loop (reference train/train.py:76-449):
dataset validation, deterministic val-sample selection, normalisation-stat
bootstrap, stage auto-advance (acoustic → textual → style → duration),
log/val/save intervals, per-stage out dirs, checkpointing, aligner export.

TPU re-design: the hot path is one jitted step per (stage, bucket); batches
stream from the host prefetcher; all scalar state machines live inside the
TrainState so host work per step is O(1) dispatch.
"""

from __future__ import annotations

import hashlib
import json
import logging
import sys
import time
from pathlib import Path
from typing import Dict, Optional

from tqdm import tqdm

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, ModelConfig
from ..data.batch_manager import BatchManager
from ..data.dataset import FilePathDataset, get_data_path_list
from ..models import build_models
from ..ops.mel import MelSpectrogram
from ..parallel import (
    global_batch_from_local,
    initialize_distributed,
    is_main_process,
    make_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicate,
)
from ..text import TextCleaner
from .checkpoint import (
    Manifest,
    NormalizationStats,
    checkpoint_name,
    load_checkpoint,
    save_checkpoint,
    save_model_safetensors,
)
from .torch_seed import seed_state_from_torch
from .init import (
    build_train_state,
    init_model_variables,
    init_slm_params,
    init_ssl_params,
    init_vocos_params,
)
from .loss_log import combine_metrics, format_metrics
from .stages import (
    STAGES,
    StageContext,
    end_alignment_epoch,
    make_eval_step,
    make_train_step,
)
from .state import merge_state, restrict_state

logger = logging.getLogger(__name__)


class TrainContext:
    """Host-side bundle of everything the loop touches."""

    def __init__(
        self,
        *,
        stage_name: str,
        out_dir: str,
        config: Config,
        model_config: ModelConfig,
    ):
        self.config = config
        self.model_config = model_config
        self.base_out_dir = Path(out_dir)
        self.stage_name = stage_name
        self.out_dir = self.base_out_dir / stage_name
        self.out_dir.mkdir(parents=True, exist_ok=True)

        self.text_cleaner = TextCleaner(model_config.symbol)
        self.models = build_models(model_config)
        self.manifest = Manifest()
        self.normalization = NormalizationStats()
        self.writer = None  # tensorboardX SummaryWriter, created lazily

        data_dir = Path(config.dataset.path)
        train_list = get_data_path_list(data_dir / config.dataset.train_data)
        val_list = get_data_path_list(data_dir / config.dataset.val_data)
        self.train_dataset = FilePathDataset(
            data_list=train_list,
            root_path=data_dir / config.dataset.wav_path,
            text_cleaner=self.text_cleaner,
            model_config=model_config,
            pitch_path=str(data_dir / config.dataset.pitch_path),
            alignment_path=str(data_dir / config.dataset.alignment_path),
        )
        self.val_dataset = FilePathDataset(
            data_list=val_list,
            root_path=data_dir / config.dataset.wav_path,
            text_cleaner=self.text_cleaner,
            model_config=model_config,
            pitch_path=str(data_dir / config.dataset.pitch_path),
            alignment_path=str(data_dir / config.dataset.alignment_path),
        )
        self.batch_manager: Optional[BatchManager] = None

    # -- normalisation bootstrap ---------------------------------------- #

    def init_normalization(self) -> None:
        """checkpoint → json → compute (reference train_context.py:191-331)."""
        norm_file = self.out_dir / "normalization.json"
        if self.normalization.frames > 0:
            norm_file.write_text(json.dumps(self.normalization.__dict__))
            return
        if norm_file.is_file():
            data = json.loads(norm_file.read_text())
            for k, v in data.items():
                setattr(self.normalization, k, v)
            if self.normalization.frames > 0:
                return
        self.compute_normalization()
        norm_file.write_text(json.dumps(self.normalization.__dict__))

    def compute_normalization(self) -> None:
        mc = self.model_config
        to_mel = MelSpectrogram(
            n_mels=mc.n_mels, n_fft=mc.n_fft, win_length=mc.win_length,
            hop_length=mc.hop_length, sample_rate=mc.sample_rate,
        )

        @jax.jit
        def stats(wave):
            mel = to_mel(wave)
            log_mel = jnp.log(1e-5 + mel)
            return log_mel.sum(), (log_mel**2).sum(), log_mel.size

        total, total2, count = 0.0, 0.0, 0
        for i in range(len(self.train_dataset)):
            item = self.train_dataset.load_item(i)
            s, s2, n = stats(jnp.asarray(item["wave"])[None])
            total += float(s)
            total2 += float(s2)
            count += int(n)
        if count > 0:
            mean = total / count
            var = (total2 - count * mean * mean) / max(count - 1, 1)
            self.normalization.mel_log_mean = float(mean)
            self.normalization.mel_log_std = float(np.sqrt(max(var, 1e-12)))
            self.normalization.frames = count
        # dataset-wide log2-F0 stats (train_context.py:210-214)
        voiced = [
            p[p > 0].ravel() for p in self.train_dataset.pitch.values()
        ]
        if voiced:
            allf0 = np.log2(np.concatenate(voiced))
            self.normalization.f0_log2_mean = float(allf0.mean())
            self.normalization.f0_log2_std = float(allf0.std())


def select_val_samples(val_dataset, count: int):
    """Deterministic sample selection by blake2b hash of the path
    (reference train/train.py:134-148)."""
    scored = [
        (hashlib.blake2b(seg.wav_path.encode(), digest_size=8).hexdigest(), i)
        for i, seg in enumerate(val_dataset.segments)
    ]
    return [i for _, i in sorted(scored)[:count]]


_META_KEYS = ("paths", "bin", "global_batch_size")


def _device_batch(batch, mesh):
    """Assemble this host's local numpy batch into globally-sharded device
    arrays (rows over the mesh 'data' axis).  Single process: the local
    batch IS the global batch."""
    return global_batch_from_local(
        {k: v for k, v in batch.items() if k not in _META_KEYS}, mesh
    )


def _is_oom(exc: Exception) -> bool:
    msg = str(exc)
    return (
        "RESOURCE_EXHAUSTED" in msg
        or "Out of memory" in msg
        or "out of memory" in msg
    )


def _is_transient_relay(exc: Exception) -> bool:
    """Remote-compile/relay hiccups that are safe to retry verbatim:
    compilation is idempotent and the step has not executed.  Observed
    killing a 350-step r5 curve run mid-compile: 'remote_compile: read
    body: response body closed before all bytes were read'."""
    msg = str(exc)
    if _is_oom(exc):
        return False  # compile-OOM also surfaces as an HTTP 500 wrapper
    return "remote_compile" in msg or (
        "INTERNAL" in msg and ("read body" in msg or "HTTP 5" in msg)
    )


def _guarded_step(step_fn, state, batch, rng, frozen, bm, mesh, skip_bins,
                  validated=None):
    """Run one train step with the reference's OOM resilience semantics
    (train/batch_manager.py:187-242): on device OOM, persistently shrink
    the bin's batch size, retry the batch truncated to the new size
    (recompiling at the smaller static shape), and after 3 failures latch
    the bin as skipped for this epoch.

    Async dispatch defers RUNTIME failures past the ``step_fn`` call this
    guard wraps, so the first time each (bin, batch_size) shape runs
    (``validated`` tracks this, per stage) the step is synchronously
    verified: the pre-step state is snapshotted to host (the step donates
    its input state, so after a failed execution the old buffers are
    unrecoverable on device), ``block_until_ready`` surfaces any runtime
    OOM here — attributable to THIS bin — and on OOM the snapshot is
    restored and the bin shrunk like a compile-time OOM (ADVICE r4).
    Once a shape has completed one step it keeps the async fast path.

    Returns (state, metrics_or_None)."""
    bin_num = batch.get("bin")
    host_rows = batch["text"].shape[0]
    oom_tries = 0
    relay_tries = 0
    while oom_tries < 3:
        key = (bin_num, bm.get_batch_size(bin_num))
        first_run = validated is not None and key not in validated
        snapshot = jax.device_get(state) if first_run else None
        try:
            device_batch = _device_batch(
                {k: v[:host_rows] if hasattr(v, "shape") else v
                 for k, v in batch.items()},
                mesh,
            )
            out_state, metrics = step_fn(state, device_batch, rng, frozen)
            if first_run:
                jax.block_until_ready(out_state.step)
                validated.add(key)
            return out_state, metrics
        except Exception as exc:  # noqa: BLE001
            if _is_oom(exc):
                if first_run:
                    # the donated input state is void after a failed
                    # execution; rebuild it from the host snapshot.
                    # Drop the failed step's outputs and inputs first —
                    # out_state alone pins a full params+opt copy in HBM,
                    # and restoring on top of it re-OOMs.
                    out_state = metrics = device_batch = None  # noqa: F841
                    state = replicate(snapshot, mesh)
            elif _is_transient_relay(exc) and not (
                "tpu_compile_helper" in str(exc) and relay_tries >= 2
            ):
                # separate budget from the OOM shrink loop: a relay
                # outage must not latch the bin as skipped.  A repeated
                # compile-helper 500 is different: the relay hides the
                # compiler's error body, and a compile-OOM surfaces
                # exactly this way — after two identical failures fall
                # through to the batch-shrink path instead of burning
                # the whole retry budget on a deterministic failure.
                relay_tries += 1
                if relay_tries > 5:
                    raise
                logger.warning(
                    "transient relay/compile fault (%s); retry %d/5",
                    str(exc)[:160], relay_tries,
                )
                time.sleep(min(15 * relay_tries, 60))
                continue
            elif "tpu_compile_helper" not in str(exc):
                raise
            oom_tries += 1
            cur = bm.get_batch_size(bin_num)
            new_bs = max(bm.divisor, cur // 2 // bm.divisor * bm.divisor)
            if new_bs >= cur:
                break
            bm.set_batch_size(bin_num, new_bs)
            host_rows = max(1, new_bs // max(jax.process_count(), 1))
            logger.warning(
                "OOM on bin %s: batch size %d -> %d (persisted), retrying",
                bin_num, cur, new_bs,
            )
    skip_bins.add(bin_num)
    logger.warning("bin %s OOMs at minimum batch; skipping this epoch", bin_num)
    return state, None


def _xla_runtime_errors():
    errs = []
    try:  # noqa: SIM105
        import jaxlib.xla_extension as _xe

        errs.append(_xe.XlaRuntimeError)
    except Exception:  # noqa: BLE001
        pass
    err = getattr(getattr(jax, "errors", None), "JaxRuntimeError", None)
    if err is not None:
        errs.append(err)
    return tuple(errs) or (Exception,)


_XLA_RUNTIME_ERRORS = _xla_runtime_errors()


def _drain_metrics(logs, state):
    """Average accumulated device-scalar metric dicts with ONE host
    transfer: stack on device, fetch the [n_logs, n_metrics] block in a
    single device_get instead of log_interval × n_metrics scalar reads
    through the transfer tunnel.

    Async dispatch means a failed step's device error can surface HERE
    rather than at the step_fn call the OOM guard wraps.  A transient
    relay fault that only hit the metric fetch is survivable (the window
    is dropped); a fault that poisoned the training state is NOT — every
    later step would re-raise the same device error, which the OOM guard
    would misclassify and use to corrupt the persisted batch plan.  So on
    fetch failure we verify state health with a canary block: if the
    state is poisoned, the canary re-raises the ORIGINAL device error and
    it propagates out of the stage loudly.  Host-side programming errors
    (e.g. inconsistent metric keys) are never caught."""
    if not logs:
        return {}
    names = sorted(logs[0].keys())
    try:
        block = jnp.stack([jnp.stack([m[k] for k in names]) for m in logs])
        means = np.asarray(block).mean(axis=0)
    except _XLA_RUNTIME_ERRORS as exc:
        jax.block_until_ready(state.step)  # poisoned state re-raises here
        logger.warning(
            "metric window dropped, state verified healthy (%s)",
            str(exc)[:200],
        )
        return {}
    return {k: float(v) for k, v in zip(names, means)}


def train_model(
    *,
    config: Config,
    model_config: ModelConfig,
    out_dir: str,
    stage_name: str = "acoustic",
    checkpoint: Optional[str] = None,
    init_torch: Optional[str] = None,
    max_steps: Optional[int] = None,
    reset_stage: bool = False,
    distributed: bool = False,
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    workers: int = 8,
) -> Manifest:
    """Multi-stage training with auto-advance.  Returns the final manifest.

    Always runs data-parallel over a mesh spanning every visible device
    (the reference trains through Accelerate/DDP everywhere,
    train/train_context.py:91-101); one device degenerates to the serial
    case.  Multi-host: pass ``distributed=True`` (plus coordinator args
    off-pod) — per-host loaders feed their slice of each global batch and
    process 0 owns logging/checkpoints."""
    if distributed:
        initialize_distributed(coordinator, num_processes, process_id)
    mesh = make_mesh()
    n_data = mesh.shape["data"]
    main_process = is_main_process()

    ctx = TrainContext(
        stage_name=stage_name,
        out_dir=out_dir,
        config=config,
        model_config=model_config,
    )
    from ..utils.profiling import save_git_state

    if main_process:
        save_git_state(ctx.base_out_dir)
    if main_process:
        try:
            from tensorboardX import SummaryWriter

            ctx.writer = SummaryWriter(str(ctx.out_dir / "tensorboard"))
        except Exception:
            ctx.writer = None

    rng = jax.random.PRNGKey(0)
    variables = init_model_variables(ctx.models, model_config, rng)
    state = build_train_state(variables, model_config)
    slm_params = init_slm_params(jax.random.PRNGKey(7), model_config)
    if not model_config.slm.weights_path and main_process:
        # random features still regularise (random-projection perceptual
        # loss), but pretrained WavLM is what the reference trains against
        # (train/losses.py:408-426) — make the silent quality downgrade loud
        logger.warning(
            "slm.weights_path is unset: the SLM perceptual loss runs on "
            "RANDOM WavLM features. For reference-parity quality, convert "
            "pretrained weights with scripts/convert_wavlm.py and set "
            "model.slm.weights_path."
        )

    if init_torch:
        state = seed_state_from_torch(state, init_torch)

    if checkpoint:
        state, ctx.manifest, ctx.normalization, ckpt_meta = load_checkpoint(
            checkpoint, state
        )
        if ckpt_meta.get("rng_key") is not None:
            # resume the interrupted run's PRNG stream (z-sampling, dropout,
            # PCPH phase) instead of replaying from PRNGKey(0)
            rng = jnp.asarray(ckpt_meta["rng_key"], jnp.uint32)
        # keep the full restored tree host-side; each stage transfers only
        # its restricted view to the device (see restrict_state)
        state = jax.device_get(state)
        logger.info("restored checkpoint %s", checkpoint)
        if reset_stage:
            # restart the stage's counters while keeping the weights
            # (reference --reset-stage, train/cli.py:79-84)
            ctx.manifest.current_step = 0
            ctx.manifest.current_epoch = 0
            ctx.manifest.stage = ""

    current = stage_name
    while current is not None:
        ctx.stage_name = current
        ctx.out_dir = ctx.base_out_dir / current
        ctx.out_dir.mkdir(parents=True, exist_ok=True)
        plan = config.training_plan.get_stage(current)
        ctx.batch_manager = BatchManager(
            ctx.train_dataset,
            ctx.out_dir,
            current,
            probe_batch_max=plan.probe_batch_max,
            num_workers=workers,
            divisor=n_data,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        ctx.init_normalization()
        steps_per_epoch = ctx.batch_manager.steps_per_epoch()
        step_limit = max(steps_per_epoch * plan.epochs, 1)
        ctx.manifest.steps_per_epoch = steps_per_epoch

        needs_ssl = current.startswith(("hubert", "cfm"))
        # frozen feature-net params ride as jit ARGUMENTS (closure capture
        # would embed them as literals in the HLO — see StageContext)
        frozen = {
            "slm": slm_params,
            "ssl": (
                init_ssl_params(jax.random.PRNGKey(11), model_config)
                if needs_ssl else None
            ),
            "vocos": (
                init_vocos_params(
                    jax.random.PRNGKey(13), config.training.vocos_weights
                )
                if current == "cfm_hubert_mel" else None
            ),
        }
        stage_ctx = StageContext(
            models=ctx.models,
            model_config=model_config,
            config=config,
            mel_mean=ctx.normalization.mel_log_mean,
            mel_std=ctx.normalization.mel_log_std,
            step_limit=step_limit,
            duration_class_weight=jnp.asarray(
                ctx.train_dataset.duration_weights
            ),
            f0_log2_mean=ctx.normalization.f0_log2_mean,
            f0_log2_std=ctx.normalization.f0_log2_std,
        )
        # stage-scoped device state: only modules this stage trains,
        # evaluates or discriminates with go to the device (reference
        # prepare_model, train/stage.py:332-349); the rest stays host-side
        # in full_state and is merged back for checkpoints / stage advance
        stage_def = STAGES[current]
        needed = (
            set(stage_def.train_models)
            | set(stage_def.eval_models)
            | set(stage_def.discriminators)
        )
        full_state, state = state, restrict_state(state, needed)
        if config.training.aot_memory_plan and ctx.batch_manager.freshly_planned:
            # replace the heuristic bucket plan with XLA's compiled memory
            # analysis (the reference's OOM probe, moved ahead of time);
            # the probe is per-device, so solved sizes scale by the data
            # axis to become global batch sizes
            ctx.batch_manager.refine_plan_aot(
                make_train_step(current, stage_ctx, plan.lr),
                state, model_config,
                stage_inputs=STAGES[current].inputs,
                budget_bytes=config.training.memory_budget_mib * 2**20,
                frozen=frozen,
                scale=n_data,
            )
            steps_per_epoch = ctx.batch_manager.steps_per_epoch()
            stage_ctx.step_limit = max(steps_per_epoch * plan.epochs, 1)
            ctx.manifest.steps_per_epoch = steps_per_epoch
        step_fn = make_parallel_train_step(
            make_train_step(current, stage_ctx, plan.lr), mesh
        )
        eval_fn = make_parallel_eval_step(make_eval_step(current, stage_ctx), mesh)
        state = replicate(state, mesh)
        frozen = replicate(frozen, mesh)
        val_manager = BatchManager(
            ctx.val_dataset, ctx.out_dir, current,
            probe_batch_max=plan.probe_batch_max,
            num_workers=workers,
            divisor=n_data,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        val_samples = select_val_samples(
            ctx.val_dataset, config.validation.sample_count
        )

        # stage-local step drives the cosine LR: resume mid-stage continues
        # from the saved step so the schedule matches the uninterrupted run
        stage_step = (
            ctx.manifest.current_step
            if checkpoint and ctx.manifest.stage == current
            else 0
        )
        state = state.replace(step=jnp.asarray(stage_step, jnp.int32))
        logs = []
        # resume position derived from the step count: epoch index =
        # completed full epochs, skip = steps already taken in the epoch
        # in progress.  (current_epoch is 1-based and bumped at epoch
        # START, so using it directly would skip the interrupted epoch's
        # remaining batches.)
        if checkpoint and ctx.manifest.stage == current:
            start_epoch = ctx.manifest.current_step // max(steps_per_epoch, 1)
            resume_skip = ctx.manifest.current_step % max(steps_per_epoch, 1)
        else:
            start_epoch = 0
            resume_skip = 0
        ctx.manifest.stage = current
        done = False
        # (bin, batch_size) shapes that have completed one verified step
        # on-device; first run of each is synchronous so a runtime OOM is
        # recoverable (see _guarded_step)
        validated_shapes: set = set()
        for epoch in range(start_epoch, plan.epochs):
            ctx.manifest.current_epoch = epoch + 1
            iterator = ctx.batch_manager.epoch_iterator(
                stage=current, epoch=epoch + 1,
                skip_batches=resume_skip if epoch == start_epoch else 0,
            )
            skip_bins = set()
            # operator progress bar (reference train.py:332-393): loss
            # postfix + countdown to the next validation/save.  Interactive
            # main process only — log files and captured runs stay clean.
            progress = tqdm(
                iterator,
                total=max(steps_per_epoch - (
                    resume_skip if epoch == start_epoch else 0
                ), 0),
                desc=f"{current} epoch {epoch + 1}/{plan.epochs}",
                unit="step", dynamic_ncols=True, leave=False,
                disable=not (main_process and sys.stderr.isatty()),
            )
            for batch in progress:
                if batch.get("bin") in skip_bins:
                    continue
                rng, step_rng = jax.random.split(rng)
                state, metrics = _guarded_step(
                    step_fn, state, batch, step_rng, frozen,
                    ctx.batch_manager, mesh, skip_bins,
                    validated=validated_shapes,
                )
                if metrics is None:  # bin latched after repeated OOM
                    continue
                ctx.manifest.current_step += 1
                ctx.manifest.current_total_step += 1
                ctx.manifest.total_trained_audio_seconds += (
                    batch["global_batch_size"]
                    * batch["audio_gt"].shape[1]
                    / model_config.sample_rate
                )
                # keep metrics as device scalars: float()-ing here would
                # block on the async step every iteration, serialising the
                # host's collate/transfer work against device compute
                logs.append(metrics)
                step = ctx.manifest.current_total_step
                if step % config.training.log_interval == 0:
                    combined = _drain_metrics(logs, state)
                    logs = []
                    total = combined.pop("loss", 0.0)
                    vi = config.training.val_interval
                    si = config.training.save_interval
                    progress.set_postfix(
                        loss=f"{total:.3f}",
                        val_in=vi - step % vi,
                        save_in=si - step % si,
                        refresh=False,
                    )
                    if main_process:
                        # on a tty the log line would write through the
                        # active bar; clear it first, redraw after
                        # (reference train.py guards with clear/display)
                        if not progress.disable:
                            progress.clear()
                        logger.info(
                            "[%s] epoch %d step %d %s", current,
                            ctx.manifest.current_epoch, step,
                            format_metrics(combined, total),
                        )
                        if not progress.disable:
                            progress.display()
                        if ctx.writer:
                            ctx.writer.add_scalar("train/loss", total, step)
                            for k, v in combined.items():
                                ctx.writer.add_scalar(f"train/{k}", v, step)
                if step % config.training.val_interval == 0:
                    if current == "alignment":
                        # the alignment stage deliberately trains on the val
                        # set at each val step (reference train.py:397-403,
                        # README.md:118 — alignment is not a generalisation
                        # task)
                        for vbatch in val_manager.epoch_iterator(
                            stage=current, epoch=epoch + 1, shuffle=False,
                            jitter=False,
                        ):
                            rng, vrng = jax.random.split(rng)
                            vdev = _device_batch(vbatch, mesh)
                            state, _ = step_fn(state, vdev, vrng, frozen)
                    _validate(
                        ctx, state, eval_fn, val_manager, current, rng,
                        val_samples, mesh, frozen,
                    )
                if step % config.training.save_interval == 0 and main_process:
                    _save(
                        ctx, merge_state(full_state, state), config,
                        model_config, rng=rng,
                    )
                if max_steps and ctx.manifest.current_total_step >= max_steps:
                    done = True
                    break
            # leave=False only clears the tty line on close(); cover the
            # break-on-max_steps and stage-end exits explicitly
            progress.close()
            if STAGES[current].uses_priors:
                state = end_alignment_epoch(state)
            if done:
                break

        state = merge_state(full_state, state)
        if current == "alignment" and main_process:
            save_model_safetensors(
                ctx.base_out_dir / "alignment_model.safetensors",
                state.params["text_aligner"],
            )
        if main_process:
            _save(ctx, state, config, model_config, final=True, rng=rng)
        if done:
            break
        current = STAGES[current].next_stage
        ctx.manifest.current_step = 0
        ctx.manifest.current_epoch = 0
        # drop the finished stage's compiled executables: stale programs
        # stay resident in HBM through the jit cache, and the next stage
        # then runtime-OOMs at shapes its own compile-time memory analysis
        # said fit (observed at the r5 alignment -> acoustic transition)
        jax.clear_caches()
    return ctx.manifest


def _validate(
    ctx, state, eval_fn, val_manager, stage, rng, val_samples, mesh,
    frozen=None,
):
    """Run the eval step over the val set; log metrics and write audio/mel
    artifacts for the deterministic sample set (reference
    train/stage.py:131-303)."""
    logs = []
    samples_written = 0
    step = ctx.manifest.current_total_step
    for batch in val_manager.epoch_iterator(
        stage=stage, epoch=0, shuffle=False, jitter=False,
    ):
        device_batch = _device_batch(batch, mesh)
        metrics, audio_pred = eval_fn(state, device_batch, rng, frozen)
        logs.append({k: float(v) for k, v in metrics.items()})
        if (
            ctx.writer is not None
            and audio_pred is not None
            and samples_written < len(val_samples)
        ):
            audio = np.asarray(audio_pred[0])
            ctx.writer.add_audio(
                f"eval/sample_{samples_written}", audio, step,
                sample_rate=ctx.model_config.sample_rate,
            )
            try:
                from ..ops.mel import MelSpectrogram
                from ..utils.figures import (
                    plot_attention,
                    plot_mel_difference,
                    plot_spectrogram,
                )

                mc = ctx.model_config
                to_mel = MelSpectrogram(
                    n_mels=mc.n_mels, n_fft=mc.n_fft,
                    win_length=mc.win_length, hop_length=mc.hop_length,
                    sample_rate=mc.sample_rate,
                )
                mel_pred = np.log(
                    np.clip(np.asarray(to_mel(audio_pred[:1]))[0], 1e-5, None)
                )
                ctx.writer.add_figure(
                    f"eval/sample_{samples_written}/mel",
                    plot_spectrogram(mel_pred, f"Predicted Mel (Step {step})"),
                    step,
                )
                gt = device_batch.get("audio_gt")
                if gt is not None:
                    mel_gt = np.log(
                        np.clip(np.asarray(to_mel(gt[:1]))[0], 1e-5, None)
                    )
                    norm_gt = (
                        mel_gt - ctx.normalization.mel_log_mean
                    ) / ctx.normalization.mel_log_std
                    ctx.writer.add_figure(
                        f"eval/sample_{samples_written}/mel_difference",
                        plot_mel_difference(
                            norm_gt, mel_pred,
                            ctx.normalization.mel_log_mean,
                            ctx.normalization.mel_log_std,
                        ),
                        step,
                    )
                align = device_batch.get("alignment")
                if align is not None:
                    ctx.writer.add_figure(
                        f"eval/attention_{samples_written}",
                        plot_attention(np.asarray(align[0])),
                        step,
                    )
            except Exception as exc:  # figures must never kill validation
                logger.warning("figure logging failed: %s", exc)
            samples_written += 1
    combined = combine_metrics(logs)
    total = combined.pop("loss", 0.0)
    if is_main_process():
        logger.info(
            "Validation step %d: %s", step, format_metrics(combined, total)
        )
    if total < ctx.manifest.best_loss:
        ctx.manifest.best_loss = total
    if ctx.writer is not None:
        ctx.writer.add_scalar("eval/loss", total, step)
        for k, v in combined.items():
            ctx.writer.add_scalar(f"eval/{k}", v, step)


def _save(ctx, state, config, model_config, final=False, rng=None):
    name = (
        "checkpoint_final"
        if final
        else checkpoint_name(
            ctx.manifest.current_epoch, ctx.manifest.current_total_step
        )
    )
    save_checkpoint(
        ctx.out_dir, name, state, ctx.manifest, ctx.normalization,
        config.model_dump_json(), model_config.model_dump_json(),
        rng_key=rng,
    )
    logger.info("saved %s", ctx.out_dir / name)

"""Checkpoint / resume via orbax (reference: accelerator.save_state,
train/train.py:433-449; dirs named checkpoint_{epoch:05d}_step_{total:09d}).

A checkpoint bundles the TrainState PyTree plus a JSON manifest holding
step/epoch/stage bookkeeping, normalisation stats and both configs —
everything the reference registers for checkpointing
(train/train_context.py:107-110)."""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


@dataclass
class Manifest:
    current_epoch: int = 0
    current_step: int = 0
    steps_per_epoch: int = 0
    current_total_step: int = 0
    total_trained_audio_seconds: float = 0.0
    stage: str = "first"
    best_loss: float = float("inf")

    def state_dict(self) -> dict:
        return asdict(self)

    def load_state_dict(self, state: dict) -> None:
        for key, value in state.items():
            if hasattr(self, key):
                setattr(self, key, value)


@dataclass
class NormalizationStats:
    mel_log_mean: float = -4.0
    mel_log_std: float = 4.0
    frames: int = 0
    f0_log2_mean: float = 7.0
    f0_log2_std: float = 1.0


def checkpoint_name(epoch: int, total_step: int) -> str:
    return f"checkpoint_{epoch:05d}_step_{total_step:09d}"


def save_checkpoint(
    out_dir: str | Path,
    name: str,
    train_state,
    manifest: Manifest,
    normalization: NormalizationStats,
    config_json: str,
    model_config_json: str,
    rng_key=None,
) -> Path:
    path = Path(out_dir) / name
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        # force=True: re-saving the same name must overwrite (e.g. resuming
        # from checkpoint_final and finishing writes checkpoint_final again)
        ckptr.save(path.absolute() / "state", train_state, force=True)
    meta = {
        "manifest": manifest.state_dict(),
        "normalization": asdict(normalization),
        "config": json.loads(config_json),
        "model_config": json.loads(model_config_json),
    }
    if rng_key is not None:
        # snapshot the host PRNG stream so resume replays the run the
        # uninterrupted process would have produced (the reference saves
        # RNG via accelerator.save_state, train/train.py:433-449)
        meta["rng_key"] = np.asarray(rng_key).tolist()
    (path / "meta.json").write_text(json.dumps(meta))
    return path


def _restore_state(path: Path, abstract_state):
    with ocp.PyTreeCheckpointer() as ckptr:
        # `item` gives orbax the TrainState template so the on-disk nested
        # dict is matched back onto the dataclass/namedtuple structure
        # (restoring without it fails: dict vs TrainState tree mismatch)
        return ckptr.restore(
            path.absolute() / "state",
            item=abstract_state,
            restore_args=jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(), abstract_state
            ),
        )


def _restore_legacy_flat(path: Path, abstract_state):
    from .optim import get_layout, migrate_flat_opt_state, set_layout
    from .optim import init_opt_states

    prev = get_layout()
    set_layout("flat")
    try:
        template = abstract_state.replace(
            opt_states=init_opt_states(abstract_state.params)
        )
    finally:
        set_layout(prev)
    state = _restore_state(path, template)
    migrated = {
        key: migrate_flat_opt_state(opt, state.params[key])
        for key, opt in state.opt_states.items()
    }
    return state.replace(opt_states=migrated)


def load_checkpoint(path: str | Path, abstract_state):
    """Restore (train_state, manifest, normalization) from a checkpoint dir.

    ``abstract_state`` is a freshly-initialised TrainState used as the
    PyTree/restore template."""
    path = Path(path)
    try:
        state = _restore_state(path, abstract_state)
    except Exception:  # noqa: BLE001
        # legacy round-2 checkpoints store adam moments as one flat vector
        # per module; retry with a flat-layout template and unravel the
        # moments back onto the param trees
        state = _restore_legacy_flat(path, abstract_state)
    meta = json.loads((path / "meta.json").read_text())
    manifest = Manifest()
    manifest.load_state_dict(meta["manifest"])
    norm = NormalizationStats(**meta["normalization"])
    return state, manifest, norm, meta


def save_model_safetensors(path: str | Path, params: Any) -> None:
    """Export one module's params as flat safetensors (the reference exports
    the aligner this way, train/train.py:425-430)."""
    from safetensors.numpy import save_file

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            getattr(p, "key", getattr(p, "idx", "?")).__str__() for p in keypath
        )
        flat[name] = np.asarray(leaf)
    save_file(flat, str(path))


def fill_from_flat(flat: dict, template: Any) -> Any:
    """Rebuild a params PyTree from a flat {"a/b/c": array} mapping using
    ``template`` for structure (and shape checks)."""
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for keypath, leaf in leaves_with_path:
        name = "/".join(
            getattr(p, "key", getattr(p, "idx", "?")).__str__() for p in keypath
        )
        new_leaves.append(np.asarray(flat[name]).reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_model_safetensors(path: str | Path, template: Any) -> Any:
    from safetensors.numpy import load_file

    return fill_from_flat(load_file(str(path)), template)

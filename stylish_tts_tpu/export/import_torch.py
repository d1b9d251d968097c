"""Import a reference (torch stylish-tts) checkpoint as a TPU artifact.

The reference trains with HF Accelerate and checkpoints via
``accelerator.save_state`` (train/train.py:433-449): one
``pytorch_model[_N].bin`` (or ``model[_N].safetensors``) per prepared
model, numbered in the registration order of build_model
(train/models/models.py:79-101).  This module converts those weights
through models/torch_convert.py into:

  * a ready-to-``speak`` inference artifact (same layout as
    export.package.package_inference_artifact), or
  * a single module's flat safetensors (e.g. the aligner exported by the
    reference's ``save_alignment``, train/train.py:425-430).

torch is only needed to unpickle ``.bin``/``.pt`` files; safetensors
inputs convert without it.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..config import ModelConfig
from ..models.torch_convert import CONVERTERS, convert_module

#: accelerator.save_state file index -> model name (reference
#: train/train.py:190-193 prepares build_model's Munch in insertion order)
REFERENCE_SAVE_ORDER = (
    "text_aligner",
    "duration_predictor",
    "pitch_energy_predictor",
    "speech_predictor",
    "mrd",
    "mpd",
    "pe_text_encoder",
    "pe_text_style_encoder",
    "pe_mel_style_encoder",
    "hubert_encoder",
    "cfm_mel_decoder",
    "cfm_pitch_predictor",
    "hubert_speech_predictor",
    "hubert_pitch_energy_predictor",
)

INFERENCE_MODELS = (
    "duration_predictor",
    "pe_text_encoder",
    "pe_text_style_encoder",
    "pitch_energy_predictor",
    "speech_predictor",
)

BATCH_STATS_PREFIX = "__batch_stats__/"


def _load_state_dict_file(path: Path) -> Dict[str, np.ndarray]:
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(str(path))
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def _model_file(ckpt_dir: Path, index: int) -> Optional[Path]:
    suffix = "" if index == 0 else f"_{index}"
    for name in (f"pytorch_model{suffix}.bin", f"model{suffix}.safetensors"):
        p = ckpt_dir / name
        if p.exists():
            return p
    return None


def load_reference_state_dicts(
    checkpoint_dir: str | Path,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Map model name -> torch state_dict for an accelerator checkpoint."""
    ckpt = Path(checkpoint_dir)
    out = {}
    for i, name in enumerate(REFERENCE_SAVE_ORDER):
        p = _model_file(ckpt, i)
        if p is not None:
            out[name] = _load_state_dict_file(p)
    if not out:
        raise FileNotFoundError(
            f"no pytorch_model*.bin / model*.safetensors under {ckpt}"
        )
    return out


def save_converted_module(out_path: str | Path, name: str, state_dict) -> None:
    """One module -> flat safetensors; batch_stats leaves (aligner BN,
    mel-style-encoder spectral norm) share the file under a prefix."""
    from safetensors.numpy import save_file

    params, stats = convert_module(name, state_dict)
    flat = dict(params)
    for k, v in stats.items():
        flat[BATCH_STATS_PREFIX + k] = np.atleast_1d(np.asarray(v))
    save_file(flat, str(out_path))


def load_converted_module(path: str | Path, variables_template):
    """Load a save_converted_module file back into flax variables
    ({"params": ..., "batch_stats": ...?}) using a template for structure."""
    from safetensors.numpy import load_file

    from ..train.checkpoint import fill_from_flat

    flat = load_file(str(path))
    params_flat = {
        k: v for k, v in flat.items() if not k.startswith(BATCH_STATS_PREFIX)
    }
    stats_flat = {
        k[len(BATCH_STATS_PREFIX):]: v
        for k, v in flat.items()
        if k.startswith(BATCH_STATS_PREFIX)
    }
    out = dict(variables_template)
    out["params"] = fill_from_flat(params_flat, variables_template["params"])
    if stats_flat:
        out["batch_stats"] = fill_from_flat(
            stats_flat, variables_template["batch_stats"]
        )
    return out


def import_torch_checkpoint(
    checkpoint: str | Path,
    out_dir: str | Path,
    model_config: ModelConfig,
    *,
    single_model: Optional[str] = None,
) -> Path:
    """Convert a reference checkpoint into a TPU inference artifact.

    ``checkpoint`` is an accelerator save_state directory (or, with
    ``single_model``, one state-dict file).  The artifact directory is
    consumable by ``stylish-tpu speak`` / export.infer.Synthesizer."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    if single_model is not None:
        if single_model not in CONVERTERS:
            raise ValueError(
                f"unknown model {single_model!r}; one of {sorted(CONVERTERS)}"
            )
        sd = _load_state_dict_file(Path(checkpoint))
        save_converted_module(
            out / f"{single_model}.safetensors", single_model, sd
        )
        return out

    state_dicts = load_reference_state_dicts(checkpoint)
    missing = [m for m in INFERENCE_MODELS if m not in state_dicts]
    if missing:
        raise FileNotFoundError(
            f"checkpoint lacks model files for {missing} "
            f"(found {sorted(state_dicts)})"
        )
    for name in INFERENCE_MODELS:
        save_converted_module(
            out / f"{name}.safetensors", name, state_dicts[name]
        )
    # the aligner rides along when present: lets `align` reuse it
    if "text_aligner" in state_dicts:
        save_converted_module(
            out / "text_aligner.safetensors",
            "text_aligner",
            state_dicts["text_aligner"],
        )
    # migrated checkpoints were trained under the reference's inverted
    # cross-attention band mask — keep that behavior at inference
    # (models/pitch_energy_predictor.py:build_monotonic_band_mask)
    model_config = model_config.model_copy(deep=True)
    model_config.pitch_energy_predictor.reference_band_mask = True
    (out / "model_config.json").write_text(model_config.model_dump_json())
    (out / "metadata.json").write_text(
        json.dumps(
            {
                "normalization": {},
                "manifest": {},
                "source": "torch-reference-import",
            }
        )
    )
    return out

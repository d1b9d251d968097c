"""Deployment artifact packaging (the reference's `convert` command
exports two ONNX graphs with config/normalisation metadata,
train/convert_to_onnx.py:21-123; on TPU the artifact is params +
config JSON consumed by export.infer.Synthesizer's jitted graphs)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict

import jax
import numpy as np

from ..config import Config, ModelConfig
from ..models import build_models
from ..train.checkpoint import load_checkpoint
from ..train.init import build_train_state, init_model_variables

INFERENCE_MODELS = (
    "duration_predictor",
    "pe_text_encoder",
    "pe_text_style_encoder",
    "pitch_energy_predictor",
    "speech_predictor",
)


def package_inference_artifact(
    config: Config,
    model_config: ModelConfig,
    *,
    checkpoint_dir: str,
    out_path: str,
) -> Path:
    from safetensors.numpy import save_file

    models = build_models(model_config)
    variables = init_model_variables(models, model_config, jax.random.PRNGKey(0))
    template = build_train_state(variables, model_config)
    state, manifest, norm, meta = load_checkpoint(checkpoint_dir, template)

    out = Path(out_path)
    out.mkdir(parents=True, exist_ok=True)
    for key in INFERENCE_MODELS:
        flat = {}
        for keypath, leaf in jax.tree_util.tree_flatten_with_path(
            state.params[key]
        )[0]:
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", "?")))
                            for p in keypath)
            flat[name] = np.asarray(leaf)
        save_file(flat, str(out / f"{key}.safetensors"))
    (out / "model_config.json").write_text(model_config.model_dump_json())
    (out / "metadata.json").write_text(
        json.dumps(
            {
                "normalization": norm.__dict__,
                "manifest": manifest.state_dict(),
            }
        )
    )
    return out


def load_inference_params(artifact_dir: str, model_config: ModelConfig):
    """Load packaged params back into the Synthesizer param dict."""
    from safetensors.numpy import load_file

    models = build_models(model_config)
    variables = init_model_variables(
        models, model_config, jax.random.PRNGKey(0), keys=list(INFERENCE_MODELS)
    )
    params: Dict[str, dict] = {}
    for key in INFERENCE_MODELS:
        flat = load_file(str(Path(artifact_dir) / f"{key}.safetensors"))
        template = variables[key]["params"]
        leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = []
        for keypath, leaf in leaves_with_path:
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", "?")))
                            for p in keypath)
            new_leaves.append(flat[name].reshape(np.shape(leaf)))
        params[key] = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return params

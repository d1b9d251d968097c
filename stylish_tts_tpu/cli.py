"""stylish-train-tpu CLI.

Subcommand parity with the reference click group (train/cli.py:41-339):
  train-align  — alignment-model pre-training
  align        — precache forced alignments using the trained aligner
  pitch        — precache ground-truth F0
  train        — multi-stage training (acoustic → textual → style → duration)
  convert      — package the deployment inference artifact

Heavy modules are imported lazily per command, as in the reference.
"""

from __future__ import annotations

import logging
from pathlib import Path

import click

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(levelname)s %(name)s: %(message)s",
)


def _load_configs(config_path, model_config_path):
    from .config import load_config_yaml, load_model_config_yaml

    config = load_config_yaml(config_path)
    model_config = load_model_config_yaml(model_config_path)
    return config, model_config


@click.group()
def main() -> None:
    """TPU-native stylish-tts trainer."""


@main.command("train")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", default=None, type=click.Path())
@click.option("--out", "out_dir", required=True, type=click.Path())
@click.option("--stage", default="acoustic")
@click.option("--checkpoint", default=None, type=click.Path())
@click.option("--max-steps", default=None, type=int, help="debug: stop early")
def train_cmd(config_path, model_config_path, out_dir, stage, checkpoint, max_steps):
    from .train.loop import train_model
    from .train.stages import is_valid_stage, valid_stage_list

    if not is_valid_stage(stage):
        raise click.UsageError(
            f"invalid stage {stage!r}; valid: {valid_stage_list()}"
        )
    config, model_config = _load_configs(config_path, model_config_path)
    train_model(
        config=config,
        model_config=model_config,
        out_dir=out_dir,
        stage_name=stage,
        checkpoint=checkpoint,
        max_steps=max_steps,
    )


@main.command("train-align")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", default=None, type=click.Path())
@click.option("--out", "out_dir", required=True, type=click.Path())
@click.option("--checkpoint", default=None, type=click.Path())
def train_align_cmd(config_path, model_config_path, out_dir, checkpoint):
    from .train.loop import train_model

    config, model_config = _load_configs(config_path, model_config_path)
    train_model(
        config=config,
        model_config=model_config,
        out_dir=out_dir,
        stage_name="alignment",
        checkpoint=checkpoint,
    )


@main.command("align")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", default=None, type=click.Path())
def align_cmd(config_path, model_config_path):
    from .dataprep.align_text import align_text

    config, model_config = _load_configs(config_path, model_config_path)
    align_text(config, model_config)


@main.command("pitch")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", default=None, type=click.Path())
@click.option("--method", default="yin", type=click.Choice(["yin"]))
def pitch_cmd(config_path, model_config_path, method):
    from .dataprep.pitch import calculate_pitch

    config, model_config = _load_configs(config_path, model_config_path)
    calculate_pitch(config, model_config, method=method)


@main.command("convert")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", default=None, type=click.Path())
@click.option("--checkpoint", required=True, type=click.Path(exists=True))
@click.option("--out", "out_path", required=True, type=click.Path())
def convert_cmd(config_path, model_config_path, checkpoint, out_path):
    """Package the two-graph inference artifact: model params as
    safetensors + model-config JSON with normalisation metadata (the
    reference embeds these into ONNX metadata, convert_to_onnx.py:122)."""
    import json

    import jax

    from .export.package import package_inference_artifact

    config, model_config = _load_configs(config_path, model_config_path)
    package_inference_artifact(
        config, model_config, checkpoint_dir=checkpoint, out_path=out_path
    )
    click.echo(f"wrote {out_path}")


if __name__ == "__main__":
    main()

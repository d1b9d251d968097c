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
@click.option("--init-torch", default=None, type=click.Path(exists=True),
              help="seed model weights from a reference (torch) "
                   "accelerator checkpoint dir before training")
@click.option("--max-steps", default=None, type=int, help="debug: stop early")
@click.option("--reset-stage", is_flag=True, default=False,
              help="restart the stage's step/epoch counters after loading "
                   "the checkpoint (reference train/cli.py:79-84)")
@click.option("--distributed", is_flag=True, default=False,
              help="multi-host: call jax.distributed.initialize")
@click.option("--coordinator", default=None,
              help="coordinator address for --distributed off-pod")
@click.option("--num-processes", default=None, type=int)
@click.option("--process-id", default=None, type=int)
@click.option("--workers", default=8, type=int,
              help="data-loader worker threads per host")
def train_cmd(config_path, model_config_path, out_dir, stage, checkpoint,
              init_torch, max_steps, reset_stage, distributed, coordinator,
              num_processes, process_id, workers):
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
        init_torch=init_torch,
        max_steps=max_steps,
        reset_stage=reset_stage,
        distributed=distributed,
        coordinator=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        workers=workers,
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
@click.option("--method", default="yin", type=click.Choice(["yin", "rmvpe"]))
@click.option("--rmvpe-weights", default=None, type=click.Path(),
              help="converted RMVPE safetensors (required for --method rmvpe)")
def pitch_cmd(config_path, model_config_path, method, rmvpe_weights):
    from .dataprep.pitch import calculate_pitch

    config, model_config = _load_configs(config_path, model_config_path)
    calculate_pitch(
        config, model_config, method=method, rmvpe_weights=rmvpe_weights
    )


@main.command("prepare-book")
@click.option("--audio", "audio_files", multiple=True, required=True,
              type=click.Path(exists=True),
              help="chapter WAV files, in book order (repeatable)")
@click.option("--text", "book_text", required=True, type=click.Path(exists=True),
              help="the book's ground-truth text")
@click.option("--out", "out_dir", required=True, type=click.Path())
@click.option("--transcript", "transcripts", multiple=True,
              type=click.Path(exists=True),
              help="optional per-chapter ASR phrase lists "
                   "(phrase|start|end|text), one per --audio in order")
@click.option("--sample-rate", default=24000, type=int)
@click.option("--seed", default=0, type=int)
def prepare_book_cmd(audio_files, book_text, out_dir, transcripts,
                     sample_rate, seed):
    """Audiobook chapters + book text -> training dataset (wav24/ +
    bucketed train lists + val split).  Counterpart of the reference's
    ttab dataprep scripts (find-phrases / match-transcriptions /
    make-segments)."""
    import json

    from .dataprep.book import prepare_book

    if transcripts and len(transcripts) != len(audio_files):
        raise click.UsageError("--transcript count must match --audio count")
    stats = prepare_book(
        audio_files=list(audio_files),
        book_text_file=book_text,
        out_dir=out_dir,
        sample_rate=sample_rate,
        transcripts=list(transcripts) or None,
        seed=seed,
    )
    click.echo(json.dumps(stats))


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


@main.command("import-torch")
@click.option("--checkpoint", required=True, type=click.Path(exists=True),
              help="reference accelerator save_state dir (or a single "
                   "state-dict file with --model)")
@click.option("--model-config", "model_config_path", default=None,
              type=click.Path(), help="model config YAML (defaults match "
                                      "the reference model.yml)")
@click.option("--out", "out_dir", required=True, type=click.Path())
@click.option("--model", "single_model", default=None,
              help="convert just one module from a single state-dict file")
def import_torch_cmd(checkpoint, model_config_path, out_dir, single_model):
    """Migrate a torch reference checkpoint to a TPU inference artifact.

    The result is consumed directly by `speak` (and `align` when the
    aligner weights are present)."""
    from .config import ModelConfig, load_model_config_yaml

    from .export.import_torch import import_torch_checkpoint

    mc = (
        load_model_config_yaml(model_config_path)
        if model_config_path
        else ModelConfig()
    )
    out = import_torch_checkpoint(
        checkpoint, out_dir, mc, single_model=single_model
    )
    click.echo(f"wrote {out}")


@main.command("speak")
@click.option("--artifact", required=True, type=click.Path(exists=True),
              help="inference artifact dir from `convert`")
@click.option("--text", "text_path", type=click.Path(exists=True),
              help="text file (normalised + split into sentences)")
@click.option("--book", "book_path", type=click.Path(exists=True),
              help="markdown book: synthesize one WAV per chapter into "
                   "--out (a directory)")
@click.option("--phonemes", default=None, help="direct IPA phoneme input")
@click.option("--out", "out_path", required=True, type=click.Path())
def speak_cmd(artifact, text_path, book_path, phonemes, out_path):
    """Long-form synthesis to WAV (capability of the reference ttab
    audiobook scripts + test_onnx driver)."""
    import numpy as np
    from scipy.io import wavfile

    from .config import load_model_config_json
    from .export.infer import Synthesizer, measure_rtf
    from .export.package import load_inference_params
    from .textfrontend import G2P, normalize_text, split_sentences

    import json as _json
    from pathlib import Path

    mc = load_model_config_json(
        (Path(artifact) / "model_config.json").read_text()
    )
    params = load_inference_params(artifact, mc)
    synth = Synthesizer(mc, params)
    if book_path:
        # chapter-per-WAV audiobook synthesis (reference
        # tts/ttab/prepare_book.py + make-book.py capability)
        from .dataprep.book import split_markdown_chapters

        g2p = G2P()
        out_dir = Path(out_path)
        out_dir.mkdir(parents=True, exist_ok=True)
        for i, (title, body) in enumerate(
            split_markdown_chapters(Path(book_path).read_text("utf-8")), 1
        ):
            sentences = split_sentences(normalize_text(body))
            audio = synth.synthesize_longform([g2p(s) for s in sentences])
            fn = out_dir / f"chapter-{i:03d}.wav"
            wavfile.write(
                str(fn), mc.sample_rate,
                (np.clip(audio, -1, 1) * 32767).astype(np.int16),
            )
            click.echo(
                f"{fn} ({audio.shape[0] / mc.sample_rate:.2f}s) {title}"
            )
        return
    if phonemes:
        audio = synth.synthesize(phonemes)
    else:
        text = Path(text_path).read_text(encoding="utf-8")
        sentences = split_sentences(normalize_text(text))
        g2p = G2P()
        audio = synth.synthesize_longform([g2p(s) for s in sentences])
    wavfile.write(
        out_path, mc.sample_rate,
        (np.clip(audio, -1, 1) * 32767).astype(np.int16),
    )
    click.echo(f"wrote {out_path} ({audio.shape[0]/mc.sample_rate:.2f}s)")


@main.command("test")
@click.option("--model-config", "model_config_path", default=None, type=click.Path())
@click.option("--frames", default=200, type=int)
@click.option("--tokens", default=100, type=int)
@click.option("--iters", default=10, type=int)
def test_cmd(model_config_path, frames, tokens, iters):
    """Parameter-count table + timed forward on random inputs
    (reference train/test.py:46-118, cli_util.py:6-21)."""
    import jax
    import jax.numpy as jnp

    from .config import load_model_config_yaml
    from .models import build_models
    from .train.init import init_model_variables
    from .utils.harness import param_table, time_forward

    mc = load_model_config_yaml(model_config_path)
    models = build_models(mc)
    variables = init_model_variables(models, mc, jax.random.PRNGKey(0))
    params = {k: v["params"] for k, v in variables.items()}
    click.echo(param_table(params))

    b = 2
    tok = jnp.zeros((b, tokens), jnp.int32)
    lengths = jnp.full((b,), tokens, jnp.int32)
    align = jnp.zeros((b, tokens, frames)).at[:, 0].set(1.0)
    pitch = jnp.full((b, frames), 120.0)
    energy = jnp.ones((b, frames))

    @jax.jit
    def fwd(tok, lengths, align, pitch, energy):
        return models["speech_predictor"].apply(
            {"params": params["speech_predictor"]},
            tok, lengths, align, pitch, energy, None,
            rngs={"sample": jax.random.PRNGKey(1)},
        ).audio

    dt = time_forward(fwd, (tok, lengths, align, pitch, energy), iters)
    audio_sec = b * frames * mc.hop_length / mc.sample_rate
    click.echo(
        f"speech_predictor forward: {dt*1000:.1f} ms/batch "
        f"({audio_sec/dt:.1f}x realtime)"
    )


if __name__ == "__main__":
    main()

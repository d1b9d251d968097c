"""Full CLI pipeline at the user surface (click runner): pitch ->
train-align -> align -> train -> convert -> speak.

Mirrors the reference's documented workflow (README: train-align, align,
pitch, train, convert; train/cli.py:41-339) end-to-end on the synthetic
dataset.  Heavy compiles — slow-marked."""

import shutil
from pathlib import Path

import numpy as np
import pytest
import yaml

from test_end_to_end import make_synthetic_dataset

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ds")
    make_synthetic_dataset(root)
    cfg = {
        "dataset": {"path": str(root)},
        "training": {
            "log_interval": 1,
            "val_interval": 1000,
            "save_interval": 1000,
        },
    }
    mc = {
        "text_encoder": {"layers": 1, "hidden_dim": 64,
                         "filter_channels": 128},
        "inter_dim": 64,
        "style_dim": 32,
        "decoder": {"hidden_dim": 128, "residual_dim": 32},
        "generator": {"type": "freegan", "input_dim": 128,
                      "hidden_dim": 128, "conv_intermediate_dim": 256},
        "slm": {"layers": 2},
        "text_aligner": {"hidden_dim": 64},
    }
    (root / "config.yml").write_text(yaml.safe_dump(cfg))
    (root / "model.yml").write_text(yaml.safe_dump(mc))
    return root


def _invoke(args):
    from click.testing import CliRunner

    from stylish_tts_tpu.cli import main

    result = CliRunner().invoke(main, args, catch_exceptions=False)
    assert result.exit_code == 0, result.output
    return result


def test_cli_full_pipeline(pipeline_root, tmp_path):
    root = pipeline_root
    cfg, mcfg = str(root / "config.yml"), str(root / "model.yml")

    # ---- pitch precache (YIN) overwrites the synthetic cache ----------
    _invoke(["pitch", "--config", cfg, "--model-config", mcfg,
             "--method", "yin"])
    from safetensors.numpy import load_file

    pitch = load_file(str(root / "pitch.safetensors"))
    assert pitch and all(np.isfinite(v).all() for v in pitch.values())

    # ---- alignment model training + aligner export --------------------
    out_align = tmp_path / "align_out"
    _invoke(["train", "--config", cfg, "--model-config", mcfg,
             "--out", str(out_align), "--stage", "alignment",
             "--max-steps", "2"])
    aligner = out_align / "alignment_model.safetensors"
    assert aligner.is_file()
    shutil.copy(aligner, root / "alignment_model.safetensors")

    # ---- forced-alignment precache ------------------------------------
    _invoke(["align", "--config", cfg, "--model-config", mcfg])
    align_map = load_file(str(root / "alignment.safetensors"))
    assert align_map
    for arr in align_map.values():
        assert arr.shape[0] == 3  # durations + boundary split probs

    # ---- acoustic training (uses both caches) -------------------------
    out_ac = tmp_path / "ac_out"
    _invoke(["train", "--config", cfg, "--model-config", mcfg,
             "--out", str(out_ac), "--stage", "acoustic",
             "--max-steps", "2"])
    ckpt = out_ac / "acoustic" / "checkpoint_final"
    assert (ckpt / "meta.json").is_file()

    # ---- package inference artifact -----------------------------------
    artifact = tmp_path / "artifact"
    _invoke(["convert", "--config", cfg, "--model-config", mcfg,
             "--checkpoint", str(ckpt), "--out", str(artifact)])
    assert (Path(artifact) / "model_config.json").is_file()

    # ---- speak: direct phonemes ---------------------------------------
    wav_path = tmp_path / "out.wav"
    _invoke(["speak", "--artifact", str(artifact),
             "--phonemes", "abcdef", "--out", str(wav_path)])
    from scipy.io import wavfile

    sr, wav = wavfile.read(wav_path)
    assert sr == 24000 and wav.size > 0

    # ---- speak: text file through the G2P frontend --------------------
    text_file = tmp_path / "text.txt"
    text_file.write_text("Hello world. This is a test sentence.")
    wav2_path = tmp_path / "out2.wav"
    _invoke(["speak", "--artifact", str(artifact),
             "--text", str(text_file), "--out", str(wav2_path)])
    sr2, wav2 = wavfile.read(wav2_path)
    assert sr2 == 24000 and wav2.size > 0

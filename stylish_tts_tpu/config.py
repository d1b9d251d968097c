"""Two-file configuration schema (run config + model config).

Capability parity with the reference config system
(/root/reference/src/stylish_tts/lib/config_loader.py:343-455): pydantic
validation, YAML loading, JSON round-trip so configs can be checkpointed and
embedded into exported model metadata.  The schema is re-designed around the
TPU build: bucket shapes, compile budgets and mesh axes are first-class.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Literal, Optional, Union

import yaml
from pydantic import BaseModel, Field


# --------------------------------------------------------------------------- #
# Model config (architecture hyper-parameters)
# --------------------------------------------------------------------------- #


class TextAlignerConfig(BaseModel):
    # TDNN/FFN width of the CTC aligner (reference hard-codes 640,
    # train/models/text_aligner.py:33-45)
    hidden_dim: int = 640
    token_embedding_dim: int = 512


class DecoderConfig(BaseModel):
    hidden_dim: int = 512
    residual_dim: int = 64


class FreeGANGeneratorConfig(BaseModel):
    """Harmonic-prior ConvNeXt vocoder head (APNet2/LightVoc lineage).

    Mirrors reference `generator: type: freegan` (model.yml:32-39)."""

    type: Literal["freegan"] = "freegan"
    input_dim: int = 512
    hidden_dim: int = 512
    conv_intermediate_dim: int = 1536
    io_conv_kernel_size: int = 7
    conformer_layers: int = 5
    conv_layers: int = 5


class RingformerGeneratorConfig(BaseModel):
    """Legacy HiFiGAN-style upsampling head with conformers.

    Mirrors reference RingformerGeneratorConfig (config_loader.py:220-244)."""

    type: Literal["ringformer"] = "ringformer"
    resblock_kernel_sizes: List[int] = [3, 7, 11]
    upsample_rates: List[int] = [4, 5]
    upsample_initial_channel: int = 512
    upsample_last_channel: int = 128
    resblock_dilation_sizes: List[List[int]] = [[1, 3, 5], [1, 3, 5], [1, 3, 5]]
    upsample_kernel_sizes: List[int] = [8, 10]
    gen_istft_n_fft: int = 60
    gen_istft_hop_size: int = 15
    depth: int = 2


GeneratorConfig = Union[FreeGANGeneratorConfig, RingformerGeneratorConfig]


class TextEncoderConfig(BaseModel):
    tokens: int = 178
    hidden_dim: int = 128
    filter_channels: int = 512
    heads: int = 8
    layers: int = 8
    kernel_size: int = 3
    dropout: float = 0.2


class StyleEncoderConfig(BaseModel):
    layers: int = 2


class MelStyleEncoderConfig(BaseModel):
    max_channels: int = 384
    skip_downsample: bool = True


class DurationPredictorConfig(BaseModel):
    n_layer: int = 4
    duration_classes: int = 16
    max_duration: int = 50
    dropout: float = 0.2
    last_dropout: float = 0.5


class PitchEnergyPredictorConfig(BaseModel):
    inter_dim: int = 256
    dropout: float = 0.2
    # replicate the reference's inverted cross-attention band mask (its MHA
    # treats mask=True as allowed while the band builder emits True=blocked;
    # see models/pitch_energy_predictor.py).  False = the corrected band
    # semantics for fresh training; `import-torch` sets True so migrated
    # checkpoints keep the behavior they were trained with.
    reference_band_mask: bool = False


class HubertConfig(BaseModel):
    model: str = "dr87/spinv2_rvc"
    hidden_dim: int = 768
    sr: int = 16000
    # safetensors from scripts/convert_hubert.py (encoder weights for
    # models/ssl.py:AdaptiveHubert); None = random-init fallback
    weights_path: Optional[str] = None


class SpeakerEmbedderConfig(BaseModel):
    hidden_dim: int = 10240
    # safetensors from scripts/convert_wespeaker.py (vblinkp SimAM-ResNet34
    # for models/wespeaker.py); None = random-init fallback
    weights_path: Optional[str] = None


class SlmConfig(BaseModel):
    model: str = "microsoft/wavlm-base-plus"
    sr: int = 16000
    # transformer layers of the WavLM-shaped feature net used by the slm
    # loss (12 = full reference parity; fewer trades fidelity for step time)
    layers: int = 12
    # safetensors produced by scripts/convert_wavlm.py; None = frozen
    # random-feature fallback (air-gapped default)
    weights_path: Optional[str] = None


class SymbolConfig(BaseModel):
    pad: str = "$"
    punctuation: str = ';:,.!?¡¿—…"()“” '
    letters: str = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    # Exact symbol inventory of the reference (train/config/model.yml:81-85);
    # kept verbatim so token ids match precached datasets and checkpoints.
    letters_ipa: str = "ɑɐɒæɓʙβɔɕçɗɖðʤəɘɚɛɜɝɞɟʄɡɠɢʛɦɧħɥʜɨɪʝɭɬɫɮʟɱɯɰŋɳɲɴøɵɸθœɶʘɹɺɾɻʀʁɽʂʃʈʧʉʊʋⱱʌɣɤʍχʎʏʑʐʒʔʡʕʢǀǁᵊǃˈˌːˑʼʴʰʱʲʷˠˤ˞↓↑→↗↘'̩'ᵻ"


class ModelConfig(BaseModel):
    """Architecture config; reference `train/config/model.yml`."""

    multispeaker: bool = False
    n_mels: int = 80
    sample_rate: int = 24000
    n_fft: int = 2048
    win_length: int = 1200
    hop_length: int = 300
    style_dim: int = 64
    inter_dim: int = 128
    # cfm_hubert_mel feature space: "model" = this model's n_mels log-mel at
    # hop_length (single frame rate everywhere); "vocos" = the pretrained
    # Vocos 100-bin / hop-256 features the reference targets
    # (train/stage_type.py:707) — required to decode validation audio with
    # converted Vocos weights.  (The reference builds its cfm decoder at
    # n_mels=80 yet feeds it 100-bin vocos features, which cannot run as
    # shipped; this flag makes the dimensions consistent either way.)
    cfm_mel_features: Literal["model", "vocos"] = "model"
    # checkpoint (remat) the flow couplings + posterior WaveNet in the
    # acoustic step: their activations at the 4x generator frame rate
    # bound the per-chip batch size; recompute-in-backward trades cheap
    # conv FLOPs for that HBM
    remat_flow: bool = False
    # compute the MRD's C=32 conv layers through the fused packed-
    # frequency Pallas kernel (ops/spec_conv.py) — the r3 trace put this
    # stack at ~72% of the acoustic step at <25% lane utilisation.
    # TPU-only; ignored (falls back to XLA convs) on CPU backends.
    mrd_pallas: bool = False

    text_aligner: TextAlignerConfig = TextAlignerConfig()
    decoder: DecoderConfig = DecoderConfig()
    generator: GeneratorConfig = Field(
        default_factory=FreeGANGeneratorConfig, discriminator="type"
    )
    text_encoder: TextEncoderConfig = TextEncoderConfig()
    style_encoder: StyleEncoderConfig = StyleEncoderConfig()
    mel_style_encoder: MelStyleEncoderConfig = MelStyleEncoderConfig()
    duration_predictor: DurationPredictorConfig = DurationPredictorConfig()
    pitch_energy_predictor: PitchEnergyPredictorConfig = PitchEnergyPredictorConfig()
    hubert: HubertConfig = HubertConfig()
    speaker_embedder: SpeakerEmbedderConfig = SpeakerEmbedderConfig()
    slm: SlmConfig = SlmConfig()
    symbol: SymbolConfig = SymbolConfig()

    @property
    def n_tokens(self) -> int:
        return self.text_encoder.tokens

    def state_dict(self) -> dict:
        return json.loads(self.model_dump_json())

    def load_state_dict(self, state: dict) -> None:
        new = ModelConfig(**state)
        for key in type(new).model_fields:
            setattr(self, key, getattr(new, key))


# --------------------------------------------------------------------------- #
# Run config (training plan, dataset, validation, loss weights)
# --------------------------------------------------------------------------- #


class StagePlanConfig(BaseModel):
    epochs: int = 20
    probe_batch_max: int = 32
    lr: float = 1e-4


class TrainingPlanConfig(BaseModel):
    alignment: StagePlanConfig = StagePlanConfig(epochs=20, lr=1e-4)
    acoustic: StagePlanConfig = StagePlanConfig(epochs=20, lr=1e-4)
    textual: StagePlanConfig = StagePlanConfig(epochs=20, lr=1e-4)
    style: StagePlanConfig = StagePlanConfig(epochs=10, lr=1e-4)
    duration: StagePlanConfig = StagePlanConfig(epochs=10, lr=1e-4)
    joint: StagePlanConfig = StagePlanConfig(epochs=10, lr=1e-4)
    hubert_acoustic: StagePlanConfig = StagePlanConfig(epochs=20, lr=1e-4)
    cfm_hubert_mel: StagePlanConfig = StagePlanConfig(epochs=20, lr=1e-4)
    cfm_hubert_pitch: StagePlanConfig = StagePlanConfig(epochs=20, lr=1e-4)

    def get_stage(self, name: str) -> StagePlanConfig:
        if not hasattr(self, name):
            raise KeyError(f"unknown stage {name!r}")
        return getattr(self, name)


class TrainingConfig(BaseModel):
    log_interval: int = 100
    save_interval: int = 2000
    val_interval: int = 2000
    device: str = "tpu"
    mixed_precision: Literal["no", "bf16"] = "bf16"
    # converted Vocos weights (scripts/convert_vocos.py) for decoding
    # cfm_hubert_mel validation mels; None falls back to Griffin-Lim
    vocos_weights: Optional[str] = None
    # TPU replaces OOM probing with ahead-of-time per-bucket memory planning;
    # this caps the device-memory budget used by the planner (MiB).
    memory_budget_mib: int = 14000
    # refine the heuristic per-bucket plan from XLA's compiled memory
    # analysis of the largest bucket (one extra AOT compile per stage the
    # first time a stage runs) — the TPU-native form of the reference's
    # OOM probe loop (train/batch_manager.py:70-164)
    aot_memory_plan: bool = True


class DatasetConfig(BaseModel):
    train_data: str = "train-list.txt"
    val_data: str = "val-list.txt"
    wav_path: str = "wav24"
    path: str = "."
    pitch_path: str = "pitch.safetensors"
    alignment_path: str = "alignment.safetensors"
    alignment_model_path: str = "alignment_model.safetensors"


class ValidationConfig(BaseModel):
    sample_count: int = 6
    force_samples: List[str] = []


class LossWeightConfig(BaseModel):
    """Per-loss weights applied by LossLog (reference config_loader.py)."""

    mel: float = 1.0
    generator: float = 1.0
    slm: float = 1.0
    pitch: float = 1.0
    energy: float = 1.0
    mag: float = 1.0
    phase: float = 1.0
    style: float = 1.0
    duration: float = 1.0
    duration_ce: float = 1.0
    confidence: float = 1.0
    align_loss: float = 1.0
    discriminator: float = 1.0
    kl_text: float = 1.0
    kl_audio: float = 1.0

    def get(self, key: str, default: float = 1.0) -> float:
        return getattr(self, key, default)


class MeshConfig(BaseModel):
    """TPU device mesh layout. Data parallel is the primary axis."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1


class Config(BaseModel):
    training: TrainingConfig = TrainingConfig()
    training_plan: TrainingPlanConfig = TrainingPlanConfig()
    dataset: DatasetConfig = DatasetConfig()
    validation: ValidationConfig = ValidationConfig()
    loss_weight: LossWeightConfig = LossWeightConfig()
    mesh: MeshConfig = MeshConfig()

    def state_dict(self) -> dict:
        return json.loads(self.model_dump_json())

    def load_state_dict(self, state: dict) -> None:
        new = Config(**state)
        for key in type(new).model_fields:
            setattr(self, key, getattr(new, key))


# --------------------------------------------------------------------------- #
# Loaders
# --------------------------------------------------------------------------- #


def load_config_yaml(path: Union[str, Path]) -> Config:
    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}
    return Config(**raw)


def load_model_config_yaml(path: Optional[Union[str, Path]] = None) -> ModelConfig:
    """Load a model config; with no path, return the packaged default."""
    if path is None:
        return ModelConfig()
    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}
    return ModelConfig(**raw)


def dump_config_json(config: BaseModel) -> str:
    return config.model_dump_json()


def load_config_json(data: str) -> Config:
    return Config(**json.loads(data))


def load_model_config_json(data: str) -> ModelConfig:
    return ModelConfig(**json.loads(data))

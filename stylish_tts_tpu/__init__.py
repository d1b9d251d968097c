"""stylish-tts-tpu: a TPU-native (JAX/XLA/Pallas/pjit) lightweight TTS training
and inference framework with the capabilities of Fannovel16/stylish-tts.

Built from scratch, TPU-first:
  * all sequence tensors are channels-last ``[batch, time, channels]`` so the
    feature axis lands on TPU lanes and matmuls/convs tile onto the MXU;
  * STFT/iSTFT are framed matmuls against windowed DFT bases (MXU-shaped);
  * everything under ``jax.jit`` uses static bucket shapes;
  * distribution is a JAX device mesh + NamedSharding, not DDP.

Reference capability map: see SURVEY.md at repo root.
"""

__version__ = "0.1.0"

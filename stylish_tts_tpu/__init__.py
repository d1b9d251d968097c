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


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache"):
    """Persistent XLA compilation cache — first compile of each bucket is
    expensive (20-300 s), every later process reuses it."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


try:  # default-on: every entry point benefits, tests included
    enable_compilation_cache()
except Exception:  # pragma: no cover - older jax without the flags
    pass

"""Model zoo. ``build_models(model_config)`` mirrors the reference
build_model registry (train/models/models.py:27-103)."""

from .registry import build_models  # noqa: F401

"""Import helper for the torch reference package at /root/reference.

Stubs the reference's heavyweight / CUDA-era dependencies (munch, pynvml,
torchaudio, k2) so its model modules import standalone on CPU.  Used only
by the torch-parity tests; the framework itself never imports torch.
"""

from __future__ import annotations

import sys
import types

REF_SRC = "/root/reference/src"


def install_reference():
    """Idempotently stub deps and put the reference package on sys.path."""
    if REF_SRC in sys.path:
        return
    munch = types.ModuleType("munch")

    class Munch(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def __setattr__(self, k, v):
            self[k] = v

    munch.Munch = Munch
    sys.modules.setdefault("munch", munch)

    pynvml = types.ModuleType("pynvml")
    pynvml.nvmlInit = lambda *a, **k: None
    pynvml.nvmlDeviceGetHandleByIndex = lambda *a, **k: None
    pynvml.nvmlDeviceGetMemoryInfo = lambda *a, **k: None
    sys.modules.setdefault("pynvml", pynvml)

    ta = types.ModuleType("torchaudio")
    ta.transforms = types.ModuleType("torchaudio.transforms")
    ta.functional = types.ModuleType("torchaudio.functional")
    ta.models = types.ModuleType("torchaudio.models")

    class _Placeholder:
        def __init__(self, *a, **k):
            pass

    for name in (
        "MelScale", "MelSpectrogram", "Resample", "Spectrogram",
        "InverseMelScale", "AmplitudeToDB",
    ):
        setattr(ta.transforms, name, _Placeholder)
    ta.models.Conformer = _Placeholder
    for mod in (ta, ta.transforms, ta.functional, ta.models):
        sys.modules.setdefault(mod.__name__, mod)

    sys.modules.setdefault("k2", types.ModuleType("k2"))

    librosa = types.ModuleType("librosa")
    librosa.filters = types.ModuleType("librosa.filters")

    def _mel(*a, **k):  # imported by rmvpe/spec.py; not used in tests
        import numpy as _np

        return _np.zeros((k.get("n_mels", 128), k.get("n_fft", 1024) // 2 + 1),
                         _np.float32)

    librosa.filters.mel = _mel
    sys.modules.setdefault("librosa", librosa)
    sys.modules.setdefault("librosa.filters", librosa.filters)

    # give our stubs a real ModuleSpec: transformers' availability probes
    # call importlib.util.find_spec on these names
    import importlib.machinery

    for name in (
        "munch", "pynvml", "k2", "librosa", "librosa.filters",
        "torchaudio", "torchaudio.transforms", "torchaudio.functional",
        "torchaudio.models",
    ):
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, "__spec__", None) is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.path.insert(0, REF_SRC)


def reference_model_config():
    """The reference's packaged default model.yml as a pydantic config."""
    install_reference()
    import importlib.resources

    from stylish_tts.lib.config_loader import load_model_config_yaml

    p = importlib.resources.files("stylish_tts.train") / "config" / "model.yml"
    with open(str(p)) as f:
        return load_model_config_yaml(f)

from . import stft, mel  # noqa: F401

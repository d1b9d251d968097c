from .normalize import normalize_text, number_to_words, split_sentences  # noqa: F401
from .g2p import G2P, to_espeak  # noqa: F401

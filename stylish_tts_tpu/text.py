"""Phoneme/character → token-id mapping.

Capability parity with the reference TextCleaner (lib/text_utils.py:8-41):
pad + punctuation + latin + IPA symbols map to contiguous ids; unknown
characters are logged and dropped.  Adds a vectorised batch encoder that
pads to a static bucket length (TPU-friendly static shapes) and brackets
the sequence with the pad token, mirroring the reference data loader
(train/dataloader.py:178-180).
"""

from __future__ import annotations

import logging
from typing import List, Sequence, Tuple

import numpy as np

from .config import SymbolConfig

logger = logging.getLogger(__name__)


class TextCleaner:
    def __init__(self, symbols: SymbolConfig | None = None):
        symbols = symbols or SymbolConfig()
        inventory = (
            [symbols.pad]
            + list(symbols.punctuation)
            + list(symbols.letters)
            + list(symbols.letters_ipa)
        )
        self.word_index_dictionary = {s: i for i, s in enumerate(inventory)}
        self.n_symbols = len(inventory)
        self.pad_id = 0

    def __call__(self, text: str) -> List[int]:
        ids = []
        for char in text:
            idx = self.word_index_dictionary.get(char)
            if idx is None:
                logger.error("Unknown symbol %r dropped from: %s", char, text)
            else:
                ids.append(idx)
        return ids

    def encode_padded(
        self, texts: Sequence[str], max_length: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Encode a batch, bracketing each sequence with the pad token and
        right-padding to ``max_length`` (static shape for jit buckets).

        Returns (tokens [B, max_length] int32, lengths [B] int32) where the
        length includes the two bracket pads."""
        batch = np.zeros((len(texts), max_length), dtype=np.int32)
        lengths = np.zeros((len(texts),), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.pad_id] + self(text) + [self.pad_id]
            if len(ids) > max_length:
                raise ValueError(
                    f"text of {len(ids)} tokens exceeds bucket {max_length}"
                )
            batch[i, : len(ids)] = ids
            lengths[i] = len(ids)
        return batch, lengths

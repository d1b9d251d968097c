"""Homograph disambiguation.

The reference resolves homographs with ModernBERT embeddings + per-word
sklearn classifiers + spacy POS tags (lib/ttab/homographs.py:17-40) — all
requiring downloads an air-gapped pod can't make.  This module provides the
same capability with a self-contained mechanism: a homograph lexicon of
part-of-speech-dependent pronunciations and a lightweight contextual POS
disambiguator (determiner/modal/particle heuristics over the neighbouring
tokens).  A learned disambiguator can be slotted in later via
``Homographs.resolve``'s classifier hook.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

# word -> (noun/adjective IPA, verb IPA)
HOMOGRAPHS: Dict[str, Tuple[str, str]] = {
    "read": ("ɹɛd", "ɹiːd"),          # past vs present resolved separately
    "lead": ("lɛd", "liːd"),
    "live": ("laɪv", "lɪv"),
    "wind": ("wɪnd", "waɪnd"),
    "bow": ("boʊ", "baʊ"),
    "tear": ("tɪɹ", "tɛɹ"),
    "close": ("kloʊs", "kloʊz"),
    "use": ("juːs", "juːz"),
    "record": ("ɹˈɛkɚd", "ɹɪkˈoːɹd"),
    "object": ("ˈɑːbdʒɛkt", "əbdʒˈɛkt"),
    "present": ("pɹˈɛzənt", "pɹɪzˈɛnt"),
    "produce": ("pɹˈoʊduːs", "pɹədˈuːs"),
    "project": ("pɹˈɑːdʒɛkt", "pɹədʒˈɛkt"),
    "content": ("kˈɑːntɛnt", "kəntˈɛnt"),
    "contract": ("kˈɑːntɹækt", "kəntɹˈækt"),
    "desert": ("dˈɛzɚt", "dɪzˈɜːt"),
    "minute": ("mˈɪnɪt", "maɪnˈuːt"),
    "refuse": ("ɹˈɛfjuːs", "ɹɪfjˈuːz"),
    "subject": ("sˈʌbdʒɛkt", "səbdʒˈɛkt"),
    "permit": ("pˈɜːmɪt", "pɚmˈɪt"),
    "conduct": ("kˈɑːndʌkt", "kəndˈʌkt"),
    "increase": ("ˈɪnkɹiːs", "ɪnkɹˈiːs"),
    "console": ("kˈɑːnsoʊl", "kənsˈoʊl"),
    "invalid": ("ˈɪnvəlɪd", "ɪnvˈælɪd"),
    "dove": ("dˈʌv", "doʊv"),
    "wound": ("wuːnd", "waʊnd"),
}

_VERB_CUES = {
    "to", "will", "would", "can", "could", "may", "might", "shall",
    "should", "must", "do", "does", "did", "don't", "doesn't", "didn't",
    "i", "we", "they", "you", "please", "not", "and",
}
_NOUN_CUES = {
    "a", "an", "the", "this", "that", "these", "those", "my", "your",
    "his", "her", "its", "our", "their", "no", "every", "each", "some",
    "any", "of",
}
_PAST_CUES = {"had", "has", "have", "was", "were", "been", "already",
              "yesterday", "just"}


class Homographs:
    def __init__(self, classifier=None):
        """``classifier(word, left_context, right_context) -> 0|1`` picks
        the (noun, verb) entry; defaults to the rule-based disambiguator."""
        self.classifier = classifier

    def is_homograph(self, word: str) -> bool:
        return word.lower() in HOMOGRAPHS

    def resolve(
        self, word: str, left: List[str], right: List[str]
    ) -> Optional[str]:
        lower = word.lower()
        if lower not in HOMOGRAPHS:
            return None
        noun_ipa, verb_ipa = HOMOGRAPHS[lower]
        if self.classifier is not None:
            choice = self.classifier(lower, left, right)
            return (noun_ipa, verb_ipa)[int(choice)]
        prev = [w.lower() for w in left[-2:]]
        # special-case 'read': tense, not POS
        if lower == "read":
            if any(w in _PAST_CUES for w in prev):
                return noun_ipa  # past tense /ɹɛd/
            if prev and prev[-1] in ("to", "will", "i'll", "can", "must"):
                return verb_ipa
            return verb_ipa
        if prev and prev[-1] in _NOUN_CUES:
            return noun_ipa
        if any(w in _VERB_CUES for w in prev):
            return verb_ipa
        nxt = [w.lower() for w in right[:1]]
        if nxt and nxt[0] in ("the", "a", "an", "to", "it", "them", "me"):
            return verb_ipa  # transitive verb followed by an object
        return noun_ipa

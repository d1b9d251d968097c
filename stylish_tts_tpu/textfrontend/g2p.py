"""Grapheme-to-phoneme conversion producing espeak-flavoured IPA matching
the 178-symbol training inventory.

Capability parity with the reference phonemes module (lib/ttab/phonemes.py),
which drives external espeak-ng through `phonemizer` plus a lexicon and
IPA fix-ups.  Air-gapped pods have no espeak, so this module provides:
  * a built-in lexicon of frequent/irregular English words,
  * context-sensitive letter-to-sound rules for everything else,
  * espeak-convention IPA post-fixes (length marks, affricate spelling,
    stress placed before the syllable onset),
  * plural/possessive inflection in phoneme space.

An external `espeak-ng` binary is used automatically when present.
"""

from __future__ import annotations

import re
import shutil
import subprocess
from typing import List, Optional

VOWELS = "iyɪeʏøɛæœaɨɘʉəɜɵɐɞʊɯɤʌɑuoɔɒː"

LEXICON = {
    "a": "ɐ", "an": "ɐn", "the": "ðə", "and": "ænd", "of": "ʌv",
    "to": "tuː", "in": "ɪn", "is": "ɪz", "was": "wʌz", "are": "ɑːɹ",
    "be": "biː", "been": "bɪn", "he": "hiː", "she": "ʃiː", "it": "ɪt",
    "they": "ðeɪ", "we": "wiː", "you": "juː", "i": "aɪ", "that": "ðæt",
    "this": "ðɪs", "these": "ðiːz", "those": "ðoʊz", "for": "fɔːɹ",
    "on": "ɑːn", "with": "wɪð", "as": "æz", "at": "æt", "by": "baɪ",
    "from": "fɹʌm", "but": "bʌt", "not": "nɑːt", "or": "ɔːɹ",
    "have": "hæv", "has": "hæz", "had": "hæd", "his": "hɪz", "her": "hɜː",
    "their": "ðɛɹ", "there": "ðɛɹ", "what": "wʌt", "when": "wɛn",
    "where": "wɛɹ", "who": "huː", "which": "wɪtʃ", "why": "waɪ",
    "how": "haʊ", "all": "ɔːl", "one": "wˈʌn", "two": "tˈuː",
    "three": "θɹˈiː", "four": "fˈoːɹ", "five": "fˈaɪv", "six": "sˈɪks",
    "seven": "sˈɛvən", "eight": "ˈeɪt", "nine": "nˈaɪn", "ten": "tˈɛn",
    "do": "duː", "does": "dʌz", "did": "dɪd", "done": "dʌn",
    "would": "wʊd", "could": "kʊd", "should": "ʃʊd", "said": "sɛd",
    "says": "sɛz", "were": "wɜː", "will": "wɪl", "can": "kæn",
    "been": "bɪn", "some": "sʌm", "come": "kʌm", "comes": "kʌmz",
    "once": "wʌns", "so": "soʊ", "no": "noʊ", "go": "ɡoʊ", "my": "maɪ",
    "me": "miː", "us": "ʌs", "our": "aʊɚ", "your": "jʊɹ", "its": "ɪts",
    "them": "ðɛm", "than": "ðæn", "then": "ðɛn", "now": "naʊ",
    "new": "nˈuː", "also": "ˈɔːlsoʊ", "only": "ˈoʊnli", "other": "ˈʌðɚ",
    "into": "ˈɪntʊ", "over": "ˈoʊvɚ", "people": "pˈiːpəl",
    "because": "bɪkˈʌz", "through": "θɹuː", "again": "ɐɡˈɛn",
    "against": "ɐɡˈɛnst", "very": "vˈɛɹi", "any": "ˈɛni", "many": "mˈɛni",
    "water": "wˈɔːɾɚ", "cow": "kˈaʊ", "young": "jˈʌŋ", "quiet": "kwˈaɪət", "cycle": "sˈaɪkəl", "zero": "zˈɪɹoʊ", "great": "ɡɹˈeɪt", "before": "bɪfˈoːɹ",
    "says": "sɛz", "own": "ˈoʊn", "too": "tuː", "know": "nˈoʊ",
    "knows": "nˈoʊz", "knew": "nˈuː", "thought": "θˈɔːt", "though": "ðoʊ",
    "enough": "ɪnˈʌf", "eyes": "ˈaɪz", "eye": "ˈaɪ", "heart": "hˈɑːɹt",
    "world": "wˈɜːld", "word": "wˈɜːd", "work": "wˈɜːk", "first": "fˈɜːst",
    "here": "hɪɹ", "out": "aʊt", "about": "ɐbˈaʊt", "up": "ʌp",
    "down": "dˈaʊn", "day": "dˈeɪ", "night": "nˈaɪt", "light": "lˈaɪt",
    "right": "ɹˈaɪt", "old": "ˈoʊld", "good": "ɡˈʊd", "little": "lˈɪɾəl",
    "after": "ˈæftɚ", "never": "nˈɛvɚ", "always": "ˈɔːlweɪz",
    "away": "ɐwˈeɪ", "every": "ˈɛvɹi", "under": "ˈʌndɚ",
    "between": "bɪtwˈiːn", "both": "boʊθ", "while": "waɪl",
    "something": "sˈʌmθɪŋ", "nothing": "nˈʌθɪŋ", "being": "bˈiːɪŋ",
    "upon": "əpˈɑːn", "made": "mˈeɪd", "make": "mˈeɪk", "like": "lˈaɪk",
    "time": "tˈaɪm", "years": "jˈɪɹz", "year": "jˈɪɹ", "way": "wˈeɪ",
    "says": "sɛz", "mr": "mˈɪstɚ", "mrs": "mˈɪsɪz", "dr": "dˈɑːktɚ",
    "st": "seɪnt", "one's": "wʌnz", "o'clock": "əklˈɑːk",
}

# context-sensitive letter-to-sound rules; first match wins.
# format: (left-context, grapheme, right-context, phonemes)
# '#' = word boundary, 'V' = any vowel letter, 'C' = any consonant letter.
LTS_RULES = [
    # tense vowel before the -tion/-ture suffixes (nation, nature)
    ("", "ation", "", "eɪʃən"),
    ("", "otion", "", "oʊʃən"),
    ("", "ution", "", "uːʃən"),
    ("", "ature", "#", "eɪtʃɚ"),
    ("", "tion", "", "ʃən"),
    ("", "sion", "", "ʒən"),
    ("", "ture", "#", "tʃɚ"),
    ("", "nging", "#", "ŋɪŋ"),  # singing, ringing: no hard g
    # doubled consonant letters are single phonemes
    ("", "bb", "", "b"), ("", "dd", "", "d"), ("", "ff", "", "f"),
    ("", "gg", "", "ɡ"), ("", "ll", "", "l"), ("", "mm", "", "m"),
    ("", "nn", "", "n"), ("", "pp", "", "p"), ("", "rr", "", "ɹ"),
    ("", "ss", "", "s"), ("", "tt", "V", "ɾ"), ("", "tt", "", "t"),
    ("", "zz", "", "z"),
    ("", "ought", "", "ɔːt"),
    ("", "aught", "", "ɔːt"),
    ("", "igh", "", "aɪ"),
    ("", "eigh", "", "eɪ"),
    ("", "ough", "#", "oʊ"),
    ("", "tch", "", "tʃ"),
    ("", "dge", "", "dʒ"),
    ("", "ck", "", "k"),
    ("", "wh", "", "w"),
    ("#", "kn", "", "n"),
    ("#", "wr", "", "ɹ"),
    ("#", "ps", "", "s"),
    ("", "ph", "", "f"),
    ("", "gh", "#", ""),
    ("", "sh", "", "ʃ"),
    ("", "ch", "", "tʃ"),
    ("", "th", "", "θ"),
    ("", "ng", "#", "ŋ"),
    ("", "ng", "", "ŋɡ"),
    ("", "n", "k", "ŋ"),        # think, bank
    ("", "qu", "", "kw"),
    ("", "oo", "k", "ʊ"),       # book, look, took
    ("", "oo", "", "uː"),
    ("", "ee", "", "iː"),
    ("", "ea", "", "iː"),
    ("", "ai", "", "eɪ"),
    ("", "ay", "", "eɪ"),
    ("", "oa", "", "oʊ"),
    ("", "ow", "#", "oʊ"),
    ("", "ow", "", "aʊ"),
    ("", "ou", "", "aʊ"),
    ("", "oi", "", "ɔɪ"),
    ("", "oy", "", "ɔɪ"),
    ("", "au", "", "ɔː"),
    ("", "aw", "", "ɔː"),
    ("", "ew", "", "uː"),
    ("", "ar", "", "ɑːɹ"),
    ("", "er", "#", "ɚ"),
    ("", "er", "", "ɜː"),
    ("", "ir", "", "ɜː"),
    ("", "ur", "", "ɜː"),
    ("", "or", "", "ɔːɹ"),
    ("", "a", "Ce#", "eɪ"),
    ("", "i", "Ce#", "aɪ"),
    ("", "o", "Ce#", "oʊ"),
    ("l", "u", "Ce#", "uː"),   # flute: no glide after l/r clusters
    ("r", "u", "Ce#", "uː"),
    ("", "u", "Ce#", "juː"),   # cute, mute: open-syllable u = /juː/
    ("C", "le", "#", "əl"),    # circle, little, table
    ("", "e", "#", ""),        # silent final e
    ("", "o", "#", "oʊ"),      # final open o: photo, piano, hero
    ("", "y", "#", "i"),
    ("#", "y", "", "j"),
    ("", "y", "", "ɪ"),
    ("", "a", "", "æ"),
    ("", "e", "", "ɛ"),
    ("", "i", "", "ɪ"),
    ("", "o", "", "ɑː"),
    ("", "u", "", "ʌ"),
    ("", "c", "e", "s"),
    ("", "c", "i", "s"),
    ("", "c", "y", "s"),
    ("", "c", "", "k"),
    ("", "g", "e#", "dʒ"),
    ("", "x", "", "ks"),
    ("", "j", "", "dʒ"),
    ("", "b", "", "b"), ("", "d", "", "d"), ("", "f", "", "f"),
    ("", "g", "", "ɡ"), ("", "h", "", "h"), ("", "k", "", "k"),
    ("", "l", "", "l"), ("", "m", "", "m"), ("", "n", "", "n"),
    ("", "p", "", "p"), ("", "r", "", "ɹ"), ("", "s", "", "s"),
    ("V", "t", "V", "ɾ"),      # American intervocalic flap: city, water
    ("", "t", "", "t"), ("", "v", "", "v"), ("", "w", "", "w"),
    ("", "z", "", "z"),
]


def _match_context(word: str, pos: int, ctx: str, after: bool) -> bool:
    if not ctx:
        return True
    if after:
        segment = word[pos:]
        for c in ctx:
            if c == "#":
                return segment == ""
            if not segment:
                return False
            ch, segment = segment[0], segment[1:]
            if c == "V" and ch not in "aeiouy":
                return False
            if c == "C" and ch in "aeiouy":
                return False
            if c not in "VC" and ch != c:
                return False
        return True
    segment = word[:pos]
    for c in reversed(ctx):
        if c == "#":
            return segment == ""
        if not segment:
            return False
        ch, segment = segment[-1], segment[:-1]
        if c == "V" and ch not in "aeiouy":
            return False
        if c == "C" and ch in "aeiouy":
            return False
        if c not in "VC" and ch != c:
            return False
    return True


def letter_to_sound(word: str) -> str:
    out = []
    pos = 0
    while pos < len(word):
        for left, grapheme, right, phonemes in LTS_RULES:
            if not word.startswith(grapheme, pos):
                continue
            if not _match_context(word, pos, left, after=False):
                continue
            if not _match_context(word, pos + len(grapheme), right, after=True):
                continue
            out.append(phonemes)
            pos += len(grapheme)
            break
        else:
            pos += 1  # drop unknown character
    return "".join(out)


def add_stress(phonemes: str) -> str:
    """Primary stress on the first vowel.  espeak places the mark
    immediately before the stressed VOWEL, after the whole onset cluster
    (kˈæt, stɹˈiːt, kwˈɪk, fjˈuːtʃɚ) — measured against its output, not
    the textbook before-the-onset convention."""
    if "ˈ" in phonemes or "ˌ" in phonemes:
        return phonemes
    for i, ch in enumerate(phonemes):
        if ch in VOWELS:
            return phonemes[:i] + "ˈ" + phonemes[i:]
    return phonemes


def pluralize(phonemes: str) -> str:
    if not phonemes:
        return phonemes
    last = phonemes.rstrip("ː")[-1] if phonemes[-1] == "ː" else phonemes[-1]
    if last in "szʃʒ" or phonemes.endswith(("tʃ", "dʒ")):
        return phonemes + "əz"
    if last in VOWELS or phonemes[-1] == "ː":
        return phonemes + "z"
    if last in "ptkfθ":
        return phonemes + "s"
    return phonemes + "z"


_ESPEAK_FIXUPS = [
    (re.compile(r"ʧ"), "tʃ"),
    (re.compile(r"ʤ"), "dʒ"),
    (re.compile(r"ɫ"), "l"),
    (re.compile(r"i($|[^ː])"), r"iː\1"),
    (re.compile(r"ɑ($|[^ː])"), r"ɑː\1"),
    (re.compile(r"u($|[^ː])"), r"uː\1"),
    (re.compile(r"ɝ"), "ɜː"),
    (re.compile(r"ɨ"), "ɪ"),
]


def to_espeak(word: str) -> str:
    """Normalise generic American IPA to espeak's conventions (length
    marks, affricates) — role of TO_ESPEAK in the reference
    (lib/ttab/phonemes.py:24-55)."""
    for pattern, repl in _ESPEAK_FIXUPS:
        word = pattern.sub(repl, word)
    return word


class G2P:
    """text -> IPA phoneme string for the TextCleaner inventory."""

    def __init__(self, use_espeak: Optional[bool] = None):
        from .homographs import Homographs

        self.espeak = shutil.which("espeak-ng") or shutil.which("espeak")
        if use_espeak is False:
            self.espeak = None
        self.homographs = Homographs()

    def word(self, word: str) -> str:
        lower = word.lower()
        if lower in LEXICON:
            return LEXICON[lower]
        if lower.endswith("'s") and lower[:-2] in LEXICON:
            return pluralize(LEXICON[lower[:-2]])
        if lower.endswith("s") and lower[:-1] in LEXICON:
            return pluralize(LEXICON[lower[:-1]])
        return add_stress(letter_to_sound(lower))

    def __call__(self, text: str) -> str:
        if self.espeak:
            try:
                out = subprocess.run(
                    [self.espeak, "-q", "--ipa=3", "-v", "en-us", text],
                    capture_output=True, text=True, timeout=30,
                ).stdout
                return to_espeak(out.replace("_", "").strip())
            except Exception:
                pass
        tokens = re.findall(r"[A-Za-z']+|[,.;:?!()…\"“”—]", text)
        parts: List[str] = []
        for i, token in enumerate(tokens):
            if re.match(r"[A-Za-z']", token):
                resolved = self.homographs.resolve(
                    token, tokens[max(0, i - 3):i], tokens[i + 1:i + 3]
                )
                parts.append(resolved if resolved else self.word(token))
            else:
                parts.append(token)
        return " ".join(parts)

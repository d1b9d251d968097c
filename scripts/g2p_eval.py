"""Measure rule-G2P phoneme error rate and homograph accuracy.

VERDICT r2 item 7: "a number in the README, not vibes".  The reference's
ground truth is live espeak-ng output (lib/ttab/phonemes.py:23-60); this
image has no espeak binary, so the golden corpus (tests/data/g2p_golden.tsv)
is hand-authored to espeak-ng en-us conventions and committed.  When an
espeak binary IS present, pass --regen-golden to re-derive the corpus from
it instead.

Reports, as one JSON line (and optionally --out FILE):
  * full-pipeline PER (lexicon + rules, what users get),
  * rules-only PER (every word forced through letter_to_sound — the
    air-gapped fallback quality for out-of-lexicon words),
  * both with and without stress/length marks,
  * homograph resolution accuracy over context sentences.
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDEN = Path(__file__).resolve().parent.parent / "tests/data/g2p_golden.tsv"

# (sentence, target word, expected IPA) — heteronyms in disambiguating
# context; expected column from the lexicon the reference disambiguates
# into (lib/ttab/homographs.py)
HOMOGRAPH_SENTENCES = [
    ("She will read the book tonight", "read", "ɹiːd"),
    ("He had read the letter twice", "read", "ɹɛd"),
    ("The lead pipe was heavy", "lead", "lɛd"),
    ("They will lead the parade", "lead", "liːd"),
    ("A gust of wind shook the tent", "wind", "wɪnd"),
    ("Please wind the clock", "wind", "waɪnd"),
    ("He took a bow after the show", "bow", "baʊ"),
    ("She tied the bow on the gift", "bow", "boʊ"),
    ("A tear rolled down her cheek", "tear", "tɪɹ"),
    ("Do not tear the paper", "tear", "tɛɹ"),
    ("Please close the door", "close", "kloʊz"),
    ("The store is close to home", "close", "kloʊs"),
    ("What is the use of it", "use", "juːs"),
    ("You can use my pen", "use", "juːz"),
    ("The soldier was wounded", "wounded", "wuːndɪd"),
    ("They live in the city", "live", "lɪv"),
    ("The show was live music", "live", "laɪv"),
    ("Wait a minute please", "minute", "mˈɪnɪt"),
    ("He kept a record of it", "record", "ɹˈɛkɚd"),
    ("They record a song every day", "record", "ɹɪkˈoːɹd"),
    ("The desert was hot and dry", "desert", "dˈɛzɚt"),
    ("Do not desert your post", "desert", "dɪzˈɜːt"),
    ("A strange object appeared", "object", "ˈɑːbdʒɛkt"),
    ("They object to the plan", "object", "əbdʒˈɛkt"),
    ("The present was wrapped in paper", "present", "pɹˈɛzənt"),
    ("They present the award tonight", "present", "pɹɪzˈɛnt"),
    ("You need a permit to park", "permit", "pˈɜːmɪt"),
    ("They permit us to enter", "permit", "pɚmˈɪt"),
    ("The contest begins at noon", "contest", "kˈɑːntɛst"),
    ("Fresh produce from the farm", "produce", "pɹˈoʊduːs"),
    ("The factories produce steel", "produce", "pɹədˈuːs"),
    ("He is a suspect in the case", "suspect", "sˈʌspɛkt"),
    ("I suspect she is right", "suspect", "səspˈɛkt"),
    ("This is a separate room", "separate", "sˈɛpəɹət"),
    ("Please separate the eggs", "separate", "sˈɛpəɹˌeɪt"),
    ("He is a graduate of the school", "graduate", "ˈɡɹædʒuət"),
    ("She will graduate in June", "graduate", "ˈɡɹædʒuˌeɪt"),
]

STRIP_MARKS = str.maketrans("", "", "ˈˌː ")


def edit_distance(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)
            ))
        prev = cur
    return prev[-1]


def per(pairs) -> dict:
    """{phoneme error rates} over (pred, gold) pairs."""
    dist = sum(edit_distance(p, g) for p, g in pairs)
    total = sum(len(g) for _, g in pairs)
    stripped = [
        (p.translate(STRIP_MARKS), g.translate(STRIP_MARKS)) for p, g in pairs
    ]
    dist_ns = sum(edit_distance(p, g) for p, g in stripped)
    total_ns = sum(len(g) for _, g in stripped)
    exact = sum(
        p.translate(STRIP_MARKS) == g.translate(STRIP_MARKS)
        for p, g in pairs
    )
    return {
        "per": round(dist / max(total, 1), 4),
        "per_no_marks": round(dist_ns / max(total_ns, 1), 4),
        "word_accuracy_no_marks": round(exact / max(len(pairs), 1), 4),
        "words": len(pairs),
    }


def regen_golden(words) -> None:
    espeak = shutil.which("espeak-ng") or shutil.which("espeak")
    if not espeak:
        raise SystemExit("--regen-golden requires an espeak binary")
    lines = []
    for w in words:
        out = subprocess.run(
            [espeak, "-q", "--ipa=3", "-v", "en-us", w],
            capture_output=True, text=True, timeout=30,
        ).stdout.strip().replace("_", "")
        lines.append(f"{w}\t{out}")
    GOLDEN.write_text("\n".join(lines) + "\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--regen-golden", action="store_true")
    args = ap.parse_args()

    from stylish_tts_tpu.textfrontend.g2p import (
        G2P, LEXICON, add_stress, letter_to_sound,
    )

    rows = [
        line.split("\t")
        for line in GOLDEN.read_text().splitlines()
        if line.strip() and not line.startswith("#")
    ]
    if args.regen_golden:
        regen_golden([w for w, _ in rows])
        return 0

    g2p = G2P(use_espeak=False)
    full, rules_only, oov = [], [], []
    for word, gold in rows:
        full.append((g2p.word(word), gold))
        rules = add_stress(letter_to_sound(word.lower()))
        rules_only.append((rules, gold))
        if word.lower() not in LEXICON:
            oov.append((g2p.word(word), gold))

    hits = 0
    for sentence, target, expected in HOMOGRAPH_SENTENCES:
        toks = sentence.split()
        i = toks.index(target)
        got = g2p.homographs.resolve(target, toks[max(0, i - 3):i],
                                     toks[i + 1:i + 3])
        hits += got == expected
    report = {
        "golden_source": "hand-authored espeak-ng en-us conventions "
                         "(no espeak binary in image)",
        "full_pipeline": per(full),
        "rules_only": per(rules_only),
        "out_of_lexicon": per(oov),
        "homograph_accuracy": round(hits / len(HOMOGRAPH_SENTENCES), 4),
        "homograph_sentences": len(HOMOGRAPH_SENTENCES),
    }
    print(json.dumps(report))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

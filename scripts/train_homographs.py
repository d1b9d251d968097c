"""Generate templated training sentences and train the learned homograph
classifier (VERDICT r3 #5).

Training data comes from grammar TEMPLATES (noun frames / verb frames
filled with a filler vocabulary), generated per heteronym stem — entirely
disjoint from the external evaluation sentences
(tests/data/heteronym_sentences_external.tsv), which are never read here.

Usage: python scripts/train_homographs.py [--epochs 200]
Writes stylish_tts_tpu/textfrontend/data/homograph_lr.npz and prints
held-out template accuracy as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stylish_tts_tpu.textfrontend.homograph_model import (  # noqa: E402
    feature_indices, pack_indices, predict, rule_score, train_logreg,
)
from stylish_tts_tpu.textfrontend.homographs import HOMOGRAPHS  # noqa: E402

# noun/adjective-slot frames: {w} marks the heteronym position
NOUN_FRAMES = [
    "the {w} was old",
    "a {w} is here",
    "this {w} looks fine",
    "his {w} broke yesterday",
    "her {w} seems small",
    "that {w} on the shelf",
    "an unusual {w} appeared",
    "my {w} works well",
    "their {w} was lost",
    "every {w} matters",
    "some {w} arrived today",
    "no {w} was found",
    "the {w} of the house",
    "a {w} for the children",
    "the {w} in the garden",
    "one {w} per family",
    "the old {w} fell apart",
    "a small {w} stood there",
    "the first {w} of the year",
    "each {w} costs money",
    "whose {w} is this",
    "another {w} arrived",
    "they saw the {w}",
    "we bought a {w}",
    "he dropped the {w} again",
    "it was a very {w} matter",
    "a rather {w} answer",
    "the most {w} room",
    "such a {w} plan",
    "how {w} the weather is",
    "fresh {w} is sold here",
    "more {w} was needed",
    "a gust of {w} came through",
    "a piece of {w} lay there",
    "full of {w} and dust",
    "the {w} broadcast begins soon",
    "the {w} was so strong",
    "too {w} to the fire",
    "he lives {w} to the station",
    "the {w} stretches for miles",
    "it had to hold more {w}",
    "she suffered a deep {w}",
    "get the {w} out",
    "upon seeing the {w} there",
    "shed a single {w}",
]
VERB_FRAMES = [
    "they {w} the boxes",
    "we {w} it daily",
    "i {w} them often",
    "you {w} the papers",
    "she will {w} the door",
    "he would {w} the offer",
    "we can {w} the goods",
    "they could {w} more food",
    "you may {w} the letter",
    "it might {w} the price",
    "we shall {w} the plan",
    "you should {w} the rope",
    "they must {w} the cargo",
    "please {w} the form",
    "do not {w} the page",
    "did you {w} the gift",
    "we do {w} the laundry",
    "to {w} the wheat takes time",
    "she wants to {w} it",
    "let us {w} the tickets",
    "help me {w} the sail",
    "who will {w} the award",
    "farmers {w} the fields",
    "workers {w} the steel",
    "students {w} their essays",
    "i never {w} my friends",
    "they always {w} the rules",
    "we often {w} the data",
    "children {w} it quickly",
    "he did not {w} the claim",
    "it was {w} around the pole",
    "the rope was {w} tightly",
    "the cloth is {w} by hand",
    "it had to {w} more cargo",
    "decided to {w} the post",
    "taught him to {w} seeds",
    "it was time to {w} the gifts",
    "too strong to {w} the sail",
    "trying to {w} the gap",
    "he had to {w} the subject",
    "how can i {w} this to her",
    "refused to {w} the terms",
    "the birds {w} into the bushes",
    "metals {w} when they cool",
    "the two sides {w} sharply",
    "day and night {w} endlessly",
    "prices {w} every year",
    "we {w} against the plan",
]
# filler nouns to diversify the non-target slots
FILLERS = [
    "box", "letter", "field", "door", "paper", "plan", "rope", "gift",
    "road", "song", "tool", "meal", "coat", "lamp", "book", "card",
]


def build_dataset(seed: int = 0):
    rng = np.random.default_rng(seed)
    rows = []  # (stem, left, right, label)
    for stem in HOMOGRAPHS:
        for frames, label in ((NOUN_FRAMES, 0), (VERB_FRAMES, 1)):
            for frame in frames:
                sent = frame.format(w=stem)
                # filler variation: swap one random non-target token
                toks = sent.split()
                j = toks.index(stem)
                variants = [toks]
                for _ in range(2):
                    t2 = list(toks)
                    slots = [
                        k for k, t in enumerate(t2)
                        if k != j and t.isalpha() and len(t) > 3
                    ]
                    if slots:
                        k = int(rng.integers(len(slots)))
                        t2[slots[k]] = FILLERS[int(rng.integers(len(FILLERS)))]
                    variants.append(t2)
                for t in variants:
                    rows.append((stem, t[:j], t[j + 1:], label))
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    args = ap.parse_args()

    rows = build_dataset()
    rng = np.random.default_rng(1)
    order = rng.permutation(len(rows))
    split = int(0.9 * len(rows))
    tr, te = order[:split], order[split:]

    I = pack_indices([feature_indices(s, l, r) for s, l, r, _ in rows])
    y = np.array([lab for *_, lab in rows], np.float32)
    rs = np.array(
        [rule_score(s, l, r) for s, l, r, _ in rows], np.float32
    )

    clf = train_logreg(I[tr], y[tr], rs[tr], epochs=args.epochs)
    acc_tr = float((predict(clf, I[tr], rs[tr]) == y[tr]).mean())
    acc_te = float((predict(clf, I[te], rs[te]) == y[te]).mean())
    clf.save()
    print(json.dumps({
        "train_sentences": len(tr),
        "heldout_sentences": len(te),
        "train_acc": round(acc_tr, 4),
        "heldout_template_acc": round(acc_te, 4),
        "rule_feature_alpha": round(clf.alpha, 4),
        "weights": str(Path("stylish_tts_tpu/textfrontend/data/"
                            "homograph_lr.npz")),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

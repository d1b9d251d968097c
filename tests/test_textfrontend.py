"""Text normalisation + G2P tests (pure host code, no jax)."""

from stylish_tts_tpu.config import SymbolConfig
from stylish_tts_tpu.text import TextCleaner
from stylish_tts_tpu.textfrontend import (
    G2P,
    normalize_text,
    number_to_words,
    split_sentences,
)


class TestNumbers:
    def test_basic(self):
        assert number_to_words(0) == "oh"
        assert number_to_words(7) == "seven"
        assert number_to_words(21) == "twenty-one"
        assert number_to_words(115) == "one hundred and fifteen"
        assert number_to_words(1000) == "one thousand"
        assert number_to_words(1234567) == (
            "one million two hundred and thirty-four thousand "
            "five hundred and sixty-seven"
        )

    def test_decimal_negative(self):
        assert number_to_words("3.14") == "three point one four"
        assert number_to_words(-5) == "minus five"


class TestNormalize:
    def test_expansion(self):
        out = normalize_text("I paid $25 for 3 books in 1999, 100% true...")
        assert "$" not in out and "%" not in out
        assert "twenty-five dollars" in out
        assert "three books" in out
        assert "nineteen ninety-nine" in out
        assert "one hundred percent" in out
        assert "…" in out

    def test_ordinals(self):
        out = normalize_text("the 3rd of May, the 21st time")
        assert "third" in out
        assert "twenty-first" in out


class TestSentences:
    def test_split_with_abbreviations(self):
        text = "Dr. Smith arrived at 5 p.m. yesterday. He was tired! Was he? Yes."
        sents = split_sentences(normalize_text(text))
        assert len(sents) >= 3
        assert sents[-1] == "Yes."
        # abbreviation did not split
        assert any("Smith" in s and "arrived" in s for s in sents)


class TestG2P:
    def test_lexicon_and_rules(self):
        g2p = G2P(use_espeak=False)
        out = g2p("the cat sat on the mat")
        assert "ðə" in out
        # every emitted symbol is in the training inventory
        cleaner = TextCleaner(SymbolConfig())
        ids = cleaner(out.replace(" ", " "))
        assert len(ids) > 0

    def test_symbols_in_inventory(self):
        g2p = G2P(use_espeak=False)
        cleaner = TextCleaner(SymbolConfig())
        out = g2p("extraordinary machines, quickly!")
        unknown = [c for c in out if c not in cleaner.word_index_dictionary]
        assert unknown == [], f"unknown symbols: {unknown}"

    def test_g2p_accuracy_vs_golden(self):
        """Measured quality floor (VERDICT r2 item 7): rule-G2P phoneme
        error rate against the committed espeak-convention golden corpus
        (scripts/g2p_eval.py publishes the full report)."""
        import json
        import subprocess
        import sys
        from pathlib import Path

        out = subprocess.run(
            [sys.executable,
             str(Path(__file__).parent.parent / "scripts/g2p_eval.py")],
            capture_output=True, text=True, timeout=120,
        )
        report = json.loads(out.stdout.strip().splitlines()[-1])
        # secondary espeak-convention golden: tight floor
        hand = report["hand_authored"]
        assert hand["full_pipeline"]["per_no_marks"] <= 0.05, hand
        assert hand["rules_only"]["per_no_marks"] <= 0.08, hand
        # 0.85: the learned classifier (default) trades a point on this
        # small self-authored set for +5pt on the external set below
        assert hand["homograph_accuracy"] >= 0.85, hand
        # primary independent CMUdict-derived golden (r4): regression
        # floors at the honestly-measured level, ratcheted as rules improve
        cmu = report["cmudict_derived"]
        # r5 ratchet: lexicon+rules overhaul measured 0.0074 PER / 0.972
        # word accuracy (G2P_r05.json); floors leave modest slack
        assert cmu["full_pipeline"]["per_no_marks"] <= 0.02, cmu
        assert cmu["full_pipeline"]["word_accuracy_no_marks"] >= 0.95, cmu
        assert cmu["rules_only"]["per_no_marks"] <= 0.15, cmu
        ext = report["external_homographs"]
        assert ext["learned_accuracy"] >= ext["heuristic_accuracy"], ext
        assert ext["learned_accuracy"] >= 0.9, ext

    def test_r5_rule_mechanics(self):
        """Lock the r5 G2P mechanics: long-vowel clusters, suffix/medial
        reduction, compound splitting, homophone-stable keys."""
        from stylish_tts_tpu.textfrontend.g2p import (
            G2P, letter_to_sound,
        )

        g2p = G2P(use_espeak=False)
        strip = str.maketrans("", "", "\u02c8\u02cc\u02d0")
        def w(word):
            return g2p.word(word).translate(strip)

        # long-vowel clusters and broad-O
        assert w("child").startswith("t\u0283a\u026ald")
        assert "a\u026a" in w("sign") and w("sign").endswith("n")
        assert w("fly").endswith("a\u026a")
        assert w("wall") == "w\u0254l"
        # nucleus-aware suffix reduction: polysyllables reduce,
        # monosyllables keep the full vowel
        assert letter_to_sound("student").endswith("\u0259nt")
        assert letter_to_sound("went").endswith("\u025bnt")
        assert letter_to_sound("dance").endswith("\u00e6ns")
        assert letter_to_sound("importance").endswith("\u0259ns")
        # transparent compounds phonemize at word edges
        assert w("notebook") == w("note") + w("book")
        assert w("newspaper") == w("news") + w("paper")

    def test_stress_and_plural(self):
        from stylish_tts_tpu.textfrontend.g2p import add_stress, pluralize

        # espeak convention: mark immediately before the stressed vowel
        assert add_stress("kæt") == "kˈæt"
        assert add_stress("stɹiːt") == "stɹˈiːt"
        assert pluralize("kæt") == "kæts"
        assert pluralize("dɑːɡ") == "dɑːɡz"
        assert pluralize("wɪʃ") == "wɪʃəz"


class TestHomographs:
    def test_noun_vs_verb(self):
        from stylish_tts_tpu.textfrontend.homographs import Homographs

        h = Homographs()
        assert h.resolve("lead", ["the"], ["pipe"]) == "lɛd"
        assert h.resolve("lead", ["will"], ["the", "way"]) == "liːd"
        assert h.resolve("record", ["the"], ["shows"]) == "ɹˈɛkɚd"
        assert h.resolve("record", ["to"], ["a", "song"]) == "ɹɪkˈoːɹd"
        assert h.resolve("cat", [], []) is None

    def test_read_tense(self):
        from stylish_tts_tpu.textfrontend.homographs import Homographs

        h = Homographs()
        assert h.resolve("read", ["had"], []) == "ɹɛd"
        assert h.resolve("read", ["to"], []) == "ɹiːd"

    def test_ate_heteronyms(self):
        from stylish_tts_tpu.textfrontend.homographs import Homographs

        h = Homographs()
        # noun/adjective /ət/ vs verb /eɪt/
        assert h.resolve("separate", ["a"], ["room"]) == "sˈɛpəɹət"
        assert h.resolve("separate", ["to"], ["the", "eggs"]).endswith("eɪt")
        assert h.resolve("graduate", ["a"], ["student"]) == "ˈɡɹædʒuət"
        assert h.resolve("graduate", ["will"], []).endswith("eɪt")

    def test_inflected_forms(self):
        from stylish_tts_tpu.textfrontend.homographs import Homographs

        h = Homographs()
        # -ed / -ing morphology forces the verb reading + voicing rules
        assert h.resolve("recorded", [], []) == "ɹɪkˈoːɹdɪd"
        assert h.resolve("recording", [], []) == "ɹɪkˈoːɹdɪŋ"
        assert h.resolve("used", [], []) == "juːzd"
        assert h.resolve("closing", [], []) == "kloʊzɪŋ"
        # plural/3sg resolves POS then voices the -s
        assert h.resolve("records", ["the"], []) == "ɹˈɛkɚdz"
        assert h.resolve("uses", ["she"], ["it"]) == "juːzəz"
        assert h.resolve("lives", ["their"], []) == "laɪvz"
        assert h.resolve("lives", ["she"], ["in"]) == "lɪvz"

    def test_tense_pair_inflections(self):
        """ADVICE r2: stems whose -ed/-ing form is the OTHER column's
        lexeme must not hit the forced-verb inflection rule."""
        from stylish_tts_tpu.textfrontend.homographs import Homographs

        h = Homographs()
        assert h.resolve("wounded", ["the"], ["soldier"]) == "wuːndɪd"
        assert h.resolve("wounding", [], []) == "wuːndɪŋ"
        assert h.resolve("leaded", [], ["glass"]) == "lɛdɪd"
        assert h.resolve("leading", ["the"], ["way"]) == "liːdɪŋ"
        assert h.resolve("winded", [], []) == "wɪndɪd"
        assert h.resolve("winding", ["the"], ["road"]) == "waɪndɪŋ"

    def test_reads_is_always_present(self):
        """ADVICE r2: 3sg '-s' grammatically excludes past tense."""
        from stylish_tts_tpu.textfrontend.homographs import Homographs

        h = Homographs()
        assert h.resolve("reads", ["she", "just"], []) == "ɹiːdz"
        assert h.resolve("reads", ["he"], ["books"]) == "ɹiːdz"

    def test_houses_stem_voicing(self):
        """ADVICE r2: 'houses' irregularly voices the stem fricative —
        /haʊzəz/ for both the plural noun and the 3sg verb."""
        from stylish_tts_tpu.textfrontend.homographs import Homographs

        h = Homographs()
        assert h.resolve("houses", ["the"], []) == "haʊzəz"
        assert h.resolve("houses", ["it"], ["the", "museum"]) == "haʊzəz"

    def test_lexicon_symbols_in_inventory(self):
        from stylish_tts_tpu.textfrontend.homographs import HOMOGRAPHS

        cleaner = TextCleaner(SymbolConfig())
        for word, (noun, verb) in HOMOGRAPHS.items():
            for ipa in (noun, verb):
                unknown = [
                    c for c in ipa if c not in cleaner.word_index_dictionary
                ]
                assert unknown == [], f"{word}: unknown symbols {unknown}"

    def test_g2p_integration(self):
        from stylish_tts_tpu.textfrontend import G2P

        g2p = G2P(use_espeak=False)
        out = g2p("the lead pipe")
        assert "lɛd" in out
        out = g2p("they will lead the way")
        assert "liːd" in out

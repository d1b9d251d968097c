"""Audiobook dataset-construction tooling (dataprep/book.py) — the
counterpart of the reference ttab scripts (find-phrases /
match-transcriptions / make-segments; see module docstring for the
file:line map)."""

from __future__ import annotations

import numpy as np
import pytest

from stylish_tts_tpu.dataprep.book import (
    TranscriptMatcher,
    build_segments,
    detect_phrases,
    match_transcripts,
    parse_phrase_list,
    prepare_book,
    write_dataset,
)

SR = 24000


def tone(seconds, freq=220.0, amp=0.3):
    t = np.arange(int(seconds * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def silence(seconds):
    return np.zeros(int(seconds * SR), np.float32)


def test_detect_phrases_splits_at_silence():
    audio = np.concatenate([
        silence(0.5), tone(1.2), silence(0.6), tone(2.0), silence(0.5),
        tone(0.8), silence(0.4),
    ])
    phrases = detect_phrases(audio, SR)
    assert len(phrases) == 3
    # spans roughly bracket the tones (0.5-1.7, 2.3-4.3, 4.8-5.6 s)
    starts = [s / SR for s, _ in phrases]
    ends = [e / SR for _, e in phrases]
    assert abs(starts[0] - 0.5) < 0.15 and abs(ends[0] - 1.7) < 0.15
    assert abs(starts[1] - 2.3) < 0.15 and abs(ends[1] - 4.3) < 0.15
    for s, e in phrases:
        assert e - s >= int(0.4 * SR)


def test_detect_phrases_force_splits_long_audio():
    # 35 s continuous tone with one quieter dip: must split, not drop
    a = tone(35.0)
    a[int(17 * SR):int(17.3 * SR)] *= 0.001
    phrases = detect_phrases(a, SR, max_phrase_s=30.0)
    assert len(phrases) >= 2
    assert all((e - s) / SR <= 30.5 for s, e in phrases)


BOOK = (
    'The quick brown fox jumps over the lazy dog. '
    '"Hello there," said the wizard, and the children laughed. '
    'They walked home through the quiet garden before dinner.'
)


def test_transcript_matcher_finds_book_phrases_in_order():
    m = TranscriptMatcher(BOOK)
    # ASR orthography differs (case, punctuation stripped)
    got1 = m.match_next("the quick brown fox jumps over the lazy dog")
    assert got1 == "The quick brown fox jumps over the lazy dog."
    got2 = m.match_next("hello there said the wizard and the children laughed")
    # grow_tokens re-attaches the opening quote and trailing period
    assert got2.startswith('"Hello there,"')
    assert got2.endswith("laughed.")
    # garbage transcript -> no match, cursor does not advance
    assert m.match_next("completely unrelated zebra nonsense xylophone") is None
    got3 = m.match_next("they walked home through the quiet garden before dinner")
    assert got3 == "They walked home through the quiet garden before dinner."


def test_transcript_matcher_is_phoneme_based():
    # homophone-level ASR errors still match through phoneme keys
    m = TranscriptMatcher("They walked two miles.")
    assert m.match_next("they walked too miles") == "They walked two miles."


def test_match_transcripts_roundtrip():
    phrases = [
        (0, SR, "the quick brown fox jumps over the lazy dog"),
        (SR, 2 * SR, None),
        (2 * SR, 3 * SR, "they walked home through the quiet garden before dinner"),
    ]
    out = match_transcripts(phrases, BOOK)
    assert out[0][2].startswith("The quick")
    assert out[1][2] is None
    assert out[2][2].startswith("They walked")


def test_build_segments_merges_to_goal_and_respects_bounds():
    rng = np.random.default_rng(0)
    phrases = [(i * 2 * SR, (i * 2 + 1) * SR, f"phrase {i}.") for i in range(20)]
    segs = build_segments(phrases, SR, rng=rng)
    assert segs
    for s, e, text in segs:
        assert 1.0 <= (e - s) / SR <= 20.0
        assert text
    # all matched phrases consumed in order
    joined = " ".join(t for _, _, t in segs)
    assert joined.index("phrase 0.") < joined.index("phrase 5.")


def test_parse_phrase_list(tmp_path):
    p = tmp_path / "phrases.txt"
    p.write_text("phrase|0|24000|hello world\nskipped\nphrase|24000|48000|more text\n")
    rows = parse_phrase_list(p)
    assert rows[0] == (0, 24000, "hello world")
    assert rows[1][2] is None
    assert rows[2] == (24000, 48000, "more text")


def test_write_dataset_layout(tmp_path):
    segs = [
        (f"a-0001-{i:05d}.wav", tone(1.5 + i), f"hello world number {i}")
        for i in range(4)
    ]
    stats = write_dataset(segs, tmp_path, SR, seed=0)
    assert stats["written"] == 4
    assert (tmp_path / "wav24").is_dir()
    train = (tmp_path / "train-list.txt").read_text().splitlines()
    val = (tmp_path / "val-list.txt").read_text().splitlines()
    assert len(train) + len(val) == 4
    for line in train:
        name, phonemes, speaker = line.split("|")
        assert (tmp_path / "wav24" / name).is_file()
        assert phonemes and speaker == "0"
    # duration-bucketed lists exist (reference train-list-{400..1600})
    assert (tmp_path / "train-list-400.txt").is_file()
    assert (tmp_path / "train-list-1600.txt").is_file()


def test_prepare_book_end_to_end(tmp_path):
    """Full driver: chapter WAV + ASR transcripts -> trainable dataset."""
    from scipy.io import wavfile

    chapter = np.concatenate([
        silence(0.5), tone(2.0, 220), silence(0.6), tone(2.5, 330),
        silence(0.6), tone(2.0, 440), silence(0.5),
    ])
    wav = tmp_path / "chapter1.wav"
    wavfile.write(str(wav), SR, (chapter * 32767).astype(np.int16))
    (tmp_path / "book.txt").write_text(BOOK)

    spans = detect_phrases(chapter, SR)
    assert len(spans) == 3
    tr = tmp_path / "chapter1.phrases.txt"
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "hello there said the wizard and the children laughed",
        "they walked home through the quiet garden before dinner",
    ]
    tr.write_text("".join(
        f"phrase|{s}|{e}|{t}\n" for (s, e), t in zip(spans, texts)
    ))

    out = tmp_path / "dataset"
    stats = prepare_book(
        audio_files=[str(wav)],
        book_text_file=str(tmp_path / "book.txt"),
        out_dir=str(out),
        sample_rate=SR,
        transcripts=[str(tr)],
        seed=0,
    )
    assert stats["written"] >= 1
    lines = (out / "train-list.txt").read_text().splitlines() + (
        out / "val-list.txt").read_text().splitlines()
    assert lines
    for line in lines:
        name, phonemes, speaker = line.split("|")
        sr, data = wavfile.read(str(out / "wav24" / name))
        assert sr == SR and len(data) > SR  # >= 1 s segments
        assert len(phonemes) > 10


def test_prepare_book_transcript_free(tmp_path):
    """Without ASR transcripts the book cursor assigns text by estimated
    speaking duration — every segment still gets in-order book text."""
    from scipy.io import wavfile

    chapter = np.concatenate(sum(
        ([tone(1.8, 200 + 40 * i), silence(0.5)] for i in range(4)), []
    ))
    wav = tmp_path / "c.wav"
    wavfile.write(str(wav), SR, (chapter * 32767).astype(np.int16))
    (tmp_path / "book.txt").write_text(BOOK)
    out = tmp_path / "ds"
    stats = prepare_book(
        audio_files=[str(wav)], book_text_file=str(tmp_path / "book.txt"),
        out_dir=str(out), sample_rate=SR, seed=0,
    )
    assert stats["written"] >= 1


def test_split_markdown_chapters():
    from stylish_tts_tpu.dataprep.book import split_markdown_chapters

    md = (
        "# The Beginning\n\nIt was a *dark* night. "
        "See [the map](http://x).\n\nMore text.\n\n"
        "## Part Two\n\nAnother chapter body.\n"
    )
    chapters = split_markdown_chapters(md)
    assert [t for t, _ in chapters] == ["The Beginning", "Part Two"]
    assert chapters[0][1] == "It was a dark night. See the map. More text."
    assert chapters[1][1] == "Another chapter body."
    # untitled leading text gets a synthesized title
    chapters = split_markdown_chapters("just prose, no headers at all")
    assert chapters[0][0].startswith("Chapter")

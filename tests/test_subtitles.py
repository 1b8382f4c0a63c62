"""Subtitle extraction (WebVTT + SRT): the WEBVTT near-magic and the
SRT counter+timing structural gate, cue-text extraction with inline
markup resolution, the chrome battery (header metadata, NOTE/STYLE
blocks, identifiers, timings, cue settings, speaker tags), short
sound-effect cues, cue caps, fuzz determinism — the same contract
battery every format carries (reference analogue: the byte -> array
decode seam at /root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.subtitles import (
    MAX_CUES,
    is_srt,
    is_subtitle,
    is_vtt,
    tokenize_subtitles,
)
from toyocr_spark.fixtures.gensub import build_srt, build_vtt

_CUES = [
    "<v Narrator>Opening line of the subtitle track kept",
    "second cue with an <i>italic</i> word kept by the scorer",
]


# --- gates -----------------------------------------------------------------


def test_vtt_gate():
    assert is_vtt(build_vtt(_CUES))
    assert is_vtt(b"\xef\xbb\xbf" + build_vtt(_CUES))  # BOM allowed
    assert not is_vtt(b"WEBVTTX\n")  # header must end at a boundary
    assert not is_vtt(b"plain prose mentioning WEBVTT late")
    assert not is_vtt(None)


def test_srt_gate():
    assert is_srt(build_srt(_CUES))
    assert not is_srt(b"1\nnot a timing line\ntext\n")
    assert not is_srt(b"not a counter\n00:00:01,000 --> 00:00:04,000\nx\n")
    # prose with a number-led line but no timing
    assert not is_srt(b"1\n2\n3\n")
    assert not is_srt(None)
    assert is_subtitle(build_vtt(_CUES)) and is_subtitle(build_srt(_CUES))


# --- structure / chrome -------------------------------------------------------


def test_vtt_cues_extract_and_chrome_dies():
    r = extract(build_vtt(_CUES))
    lines = r.text.split("\n")
    assert lines[0] == "Opening line of the subtitle track kept"
    assert lines[1] == "second cue with an italic word kept by the scorer"
    assert r.n_kept == 2
    assert "WEBVTT" not in r.text  # header line
    assert "Kind:" not in r.text and "Language:" not in r.text  # metadata
    assert "planted comment" not in r.text  # NOTE block
    assert "-->" not in r.text and "position:10%" not in r.text  # timings
    assert "Narrator" not in r.text  # speaker annotation, not text
    assert "<i>" not in r.text  # inline markup resolved


def test_srt_cues_extract_and_counters_die():
    r = extract(build_srt(_CUES))
    lines = r.text.split("\n")
    assert lines == [
        "Opening line of the subtitle track kept",
        "second cue with an italic word kept by the scorer",
    ]
    assert "-->" not in r.text


def test_multiline_cue_joins():
    r = extract(build_srt(["line one of the cue\nline two joins with a space"]))
    assert r.text == "line one of the cue line two joins with a space"


def test_trailing_sound_effect_cue_dies():
    r = extract(build_vtt([*_CUES, "[Music]"]))
    assert "[Music]" not in r.text
    assert r.n_kept == 2


def test_vtt_without_idents_or_settings():
    r = extract(build_vtt(_CUES, with_idents=False, with_settings=False))
    assert r.n_kept == 2
    assert r.text.startswith("Opening line")


def test_style_and_note_blocks_skip():
    raw = (
        b"WEBVTT\n\nSTYLE\n::cue { color: red }\n\n"
        b"NOTE a comment\nspanning two lines\n\n"
        b"00:00.000 --> 00:04.000\nthe only real cue text kept here\n"
    )
    assert is_vtt(raw)
    blocks = tokenize_subtitles(raw)
    assert [b.text for b in blocks] == ["the only real cue text kept here"]


def test_cue_cap_bounds_the_walk():
    cues = [f"cue number {i} text long enough" for i in range(MAX_CUES + 5)]
    assert len(tokenize_subtitles(build_srt(cues))) == MAX_CUES


# --- fuzz / determinism -------------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    for base in (build_vtt(_CUES), build_srt(_CUES)):
        rng = random.Random(11)
        for _ in range(40):
            buf = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            cut = bytes(buf[: rng.randrange(1, len(buf))])
            assert extract(cut) == extract(cut)

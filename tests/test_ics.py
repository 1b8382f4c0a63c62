"""iCalendar (.ics) extraction: the de-facto-magic gate, RFC 5545
unfolding / parameter strip / TEXT unescaping, summary-as-title with
description paragraphs, metadata + VTIMEZONE + VALARM chrome, link
mining, fuzz determinism, dispatch precedence — the contract battery
every format carries (reference analogue: the byte -> array decode
seam at /root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.icsleg import (
    MAX_COMPONENTS,
    ics_links,
    is_ics,
    tokenize_ics,
)
from toyocr_spark.fixtures.genical import build_ics

_EVENTS = [
    ("First Talk Title", "first talk description long enough to keep here"),
    ("Second Talk Title", "second talk description also long enough to keep"),
]


# --- gate -----------------------------------------------------------------


def test_gate_is_de_facto_magic():
    assert is_ics(build_ics(_EVENTS))
    assert is_ics(b"  \nBEGIN:VCALENDAR\r\nEND:VCALENDAR\r\n")  # lstrip tolerated
    assert not is_ics(b"the feed said BEGIN:VCALENDAR somewhere inside prose")
    assert not is_ics(b"<html><body>BEGIN:VCALENDAR</body></html>")
    assert not is_ics(None)
    assert not is_ics("string input")


# --- grammar ----------------------------------------------------------------


def test_summary_title_description_body_chrome_dies():
    r = extract(build_ics(_EVENTS))
    assert r.text.split("\n") == [
        "First Talk Title",
        _EVENTS[0][1],
        "Second Talk Title",
        _EVENTS[1][1],
    ]
    assert r.n_kept == 4
    # the full chrome battery is structurally excluded
    for chrome in (
        "fixture calendar chrome",  # PRODID
        "timezone chrome label",  # VTIMEZONE
        "location chrome hall",  # LOCATION
        "Organizer Chrome",  # ORGANIZER param
        "alarm reminder chrome",  # VALARM sub-component
        "GREGORIAN",
        "FREQ=WEEKLY",
    ):
        assert chrome not in r.text, chrome


def test_unfolding_crosses_the_75_octet_boundary_mid_word():
    long_desc = (
        "unbrokenword" * 12
        + " and then a tail that proves the fold splice is seamless"
    )
    blocks = tokenize_ics(build_ics([("T", long_desc)]))
    assert blocks[1].text == long_desc  # refolded bytes reassemble exactly


def test_text_unescaping_and_paragraph_split():
    desc = "one, two; three\\four"
    blocks = tokenize_ics(build_ics([("A, B; C", desc)], multiline_description=True))
    assert [b.text for b in blocks] == [
        "A, B; C",
        desc,
        f"next paragraph of {desc}",
    ]
    assert [b.kind for b in blocks] == ["title", "text", "text"]


def test_component_cap_bounds_the_walk():
    many = build_ics(
        [(f"event {i}", f"description {i}") for i in range(MAX_COMPONENTS + 16)]
    )
    titles = [b for b in tokenize_ics(many) if b.kind == "title"]
    assert len(titles) == MAX_COMPONENTS


# --- links ------------------------------------------------------------------


def test_links_url_property_and_description_urls():
    cal = build_ics(
        [("t", "see https://talk.example/deck for slides")],
        with_alarm=True,
    )
    assert ics_links(cal) == [
        "https://talk.example/deck",
        "https://cal.example/event/0",
    ]


# --- fuzz ---------------------------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = build_ics(_EVENTS, multiline_description=True)
    rng = random.Random(20240168)
    for _ in range(40):
        buf = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = rng.randrange(len(buf))
        for payload in (bytes(buf), bytes(buf[:cut])):
            a = extract(payload)
            b = extract(payload)
            assert a.text == b.text and a.n_kept == b.n_kept

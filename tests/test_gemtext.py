"""Gemtext extraction: the `=>`-link-anchored structural gate and its
traps (fenced arrow code in a README never counts), heading / bare-
line paragraph / bullet / quote / preformat semantics, link-line
scoring (every link line is 100% anchor text and dies by the shared
density rule, the HTML-consistent call), link mining, fuzz determinism — the same
contract battery every format carries (reference analogue: the byte
-> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.gemtextleg import (
    gemtext_links,
    is_gemtext,
    tokenize_gemtext,
)
from toyocr_spark.extractor.markdown import is_markdown
from toyocr_spark.fixtures.gengemtext import build_gemtext

_PARAS = [
    "the first paragraph keeps going long enough to clear the threshold here",
    "second paragraph also long enough to clear every keep threshold easily",
]


def _doc(**kw) -> bytes:
    return build_gemtext("Docs Page Title Here", _PARAS, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_capsule():
    assert is_gemtext(_doc())


def test_gate_rejects_prose_markdown_and_fenced_arrows():
    assert not is_gemtext(b"plain prose with no gemtext constructs\nmore prose")
    # a markdown README whose CODE FENCE holds '=>'-led Scala arrows
    # must not grow gemtext link evidence from them
    md = (
        b"# Head\n\nsome prose here\n\n```scala\n=> case one\n=> case two\n"
        b"=> case three\n```\n\n- item one\n- item two\n"
    )
    assert not is_gemtext(md)
    assert is_markdown(md)
    assert not is_gemtext(b"<html><body>=> /a A\n=> /b B</body></html>")
    assert not is_gemtext(None)
    # one link line alone is not enough
    assert not is_gemtext(b"=> https://x.example/ one link\nplain prose here\n")


# --- structure / scoring --------------------------------------------------


def test_title_paragraphs_extract_and_nav_dies():
    r = extract(_doc())
    lines = r.text.split("\n")
    assert lines[0] == "Docs Page Title Here"
    assert lines[1:3] == _PARAS
    assert r.spans[0][2] == "title"
    assert "Home" not in r.text  # header + footer nav runs
    assert "Contact" not in r.text


def test_labeled_link_lines_die_like_html_anchors():
    # a link line's label is 100% anchor text — the HTML-consistent
    # rule: even a sentence-length label is navigation, not prose
    r = extract(
        _doc(
            links=[
                (
                    "the full write-up of this capsule's project with every detail",
                    "https://x.example/writeup",
                )
            ]
        )
    )
    assert "write-up" not in r.text


def test_bullets_quotes_and_preformat():
    r = extract(
        _doc(
            items=[
                "first list item long enough to keep",
                "second list item long enough too",
            ],
            pre=["(define (f x) (* x x))", "(f 7)"],
            quote=[
                "a quoted line of prose long enough to keep",
                "joined with the next quoted line here",
            ],
        )
    )
    assert "first list item long enough to keep" in r.text
    assert "(define (f x) (* x x)) (f 7)" in r.text
    assert "planted alt chrome" not in r.text  # opener alt text
    assert (
        "a quoted line of prose long enough to keep joined with the next"
        in r.text
    )
    kinds = [s[2] for s in r.spans]
    assert "list" in kinds


def test_heading_levels():
    src = b"=> /a A\n=> /b B\n# One Top\n## Two Sub\n### Three Deep\nbody line long enough to keep here\n"
    heads = [
        (b.tag_path, b.text) for b in tokenize_gemtext(src) if b.kind == "title"
    ]
    assert heads == [
        (("gmi", "h1"), "One Top"),
        (("gmi", "h2"), "Two Sub"),
        (("gmi", "h3"), "Three Deep"),
    ]


# --- link mining ----------------------------------------------------------


def test_links_absolute_only_pre_excluded():
    g = _doc(
        links=[("ext", "https://x.example/e")],
        pre=["=> https://code.example/never nope"],
    )
    links = gemtext_links(g)
    assert "https://x.example/e" in links
    assert "https://nav.example/" in links
    assert all("code.example" not in u for u in links)  # preformat excluded
    # gemini:// and relative targets are capsule navigation, not edges
    g2 = build_gemtext("T", ["p"], links=[("g", "gemini://cap.example/")])
    assert all("gemini" not in u for u in gemtext_links(g2))


# --- fuzz / determinism ---------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc()
    rng = random.Random(43)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)

"""RTF extraction: control-word walk, escape families, structural
header/footer exclusion, HYPERLINK field link accounting, title by
font size, and the fuzz contract."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.rtf import is_rtf, tokenize_rtf
from toyocr_spark.fixtures.genrtf import build_rtf, paragraph


def _doc():
    return build_rtf(
        body=[
            paragraph("Main Heading Of The Legacy Document", fs=32),
            paragraph("Body paragraph with accented café naïve — and a wide 漢字 char."),
            paragraph("Home | Products | Contact us", link="https://nav.example/"),
            paragraph("Second body paragraph long enough to survive the scorer."),
        ],
        header_text="CONFIDENTIAL header never extract",
        footer_text="page 1 footer junk",
    )


def test_is_rtf_gates_on_magic():
    assert is_rtf(_doc())
    assert not is_rtf(b"<html>{\\rtf1}</html>")
    assert not is_rtf(b"%PDF-1.4")
    assert not is_rtf(None)


def test_rtf_paragraphs_escapes_and_boilerplate():
    """cp1252 \\'hh and signed \\uN escapes round-trip, the fs>=28
    half-point rule maps to the title kind (the PDF 14 pt twin),
    header/footer destinations are never read, and fonttbl/colortbl/
    stylesheet/info chrome contributes nothing."""
    r = extract(_doc())
    assert r.text == (
        "Main Heading Of The Legacy Document\n"
        "Body paragraph with accented café naïve — and a wide 漢字 char.\n"
        "Second body paragraph long enough to survive the scorer."
    )
    assert r.spans[0][2] == "title"
    assert "CONFIDENTIAL" not in r.text and "footer" not in r.text
    assert "Times New Roman" not in r.text and "fixture doc" not in r.text
    # the nav field died by link density, not by absence: it tokenized
    blocks = tokenize_rtf(_doc())
    nav = [b for b in blocks if b.text.startswith("Home |")]
    assert nav and nav[0].link_chars == nav[0].n_chars


def test_rtf_unicode_fallback_skip_and_binary_skip():
    # \uc1 fallback '?' must be swallowed; \bin payload must be skipped
    blob = (
        b"{\\rtf1\\ansi\\uc1 wide \\u21319? char and "
        b"{\\pict\\bin5 \\x01}{}binary skipped entirely\\par}"
    )
    blocks = tokenize_rtf(blob)
    assert blocks and blocks[0].text.startswith("wide 升 char and")
    assert "?" not in blocks[0].text


def test_rtf_malformed_quiet_and_deterministic():
    blob = _doc()
    rng = random.Random(777)
    for cut in (10, len(blob) // 3, len(blob) - 2):
        first = tokenize_rtf(blob[:cut])
        assert tokenize_rtf(blob[:cut]) == first
    for _ in range(80):
        fuzzed = bytearray(blob)
        for _ in range(rng.randint(1, 5)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        first = extract(payload)
        assert extract(payload) == first


def test_rtf_through_spark_pipeline(spark):
    from toyocr_spark.pipeline import extract_pages

    blob = build_rtf(body=[paragraph("One legacy paragraph long enough to keep.")])
    rows = [(f"https://r{i}.example/doc.rtf", bytearray(blob)) for i in range(6)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r.extracted_text for r in extract_pages(pages.repartition(3)).collect()}
    assert len(got) == 6
    assert all(v == "One legacy paragraph long enough to keep." for v in got.values())


def test_rtf_links_mines_absolute_hyperlink_fields():
    """rtf_links: HYPERLINK field targets in document order, duplicates
    preserved; \\l bookmarks and local paths (no scheme) are navigation,
    not edges; RTF escapes inside the literal decode; quoted and bare
    targets both parse."""
    from toyocr_spark.extractor.rtf import rtf_links
    from toyocr_spark.fixtures.genrtf import build_rtf, paragraph

    doc = build_rtf(
        body=[
            paragraph("see the spec", link="https://spec.example/a"),
            # bookmark switch: intra-document, never an edge
            "{\\pard {\\field{\\*\\fldinst HYPERLINK \\l \"sec1\"}"
            "{\\fldrslt Section One}}\\par}",
            # local file target: no scheme, dropped
            '{\\pard {\\field{\\*\\fldinst HYPERLINK "notes.doc"}'
            "{\\fldrslt the notes}}\\par}",
            # bare (unquoted) target, duplicates preserved
            "{\\pard {\\field{\\*\\fldinst HYPERLINK https://spec.example/a}"
            "{\\fldrslt again}}\\par}",
            # escaped braces + cp1252 hex escape inside the literal
            '{\\pard {\\field{\\*\\fldinst HYPERLINK "https://ex.example/'
            "\\{q\\}/caf\\'e9\"}{\\fldrslt cafe}}\\par}",
        ]
    )
    assert rtf_links(doc) == [
        "https://spec.example/a",
        "https://spec.example/a",
        "https://ex.example/{q}/café",
    ]
    assert rtf_links(b"not rtf at all") == []
    # determinism on truncation (the fuzz contract every walker keeps)
    for cut in (10, len(doc) // 2, len(doc) - 3):
        assert rtf_links(doc[:cut]) == rtf_links(doc[:cut])

"""OpenDocument Text (.odt) extraction: ODF package walk, mixed-
content paragraph assembly, inline-note and styles.xml boilerplate
exclusion, hyperlink accounting, and the shared-kernel dispatch — the
same contract battery every other format carries (reference analogue:
the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.odt import is_odt, odt_links, tokenize_odt
from toyocr_spark.fixtures.genodt import build_odt, note, paragraph, table

_PARAS = [
    "First paragraph with plenty of characters to clear the score threshold.",
    "Second paragraph, also long enough to be kept by the density rules here.",
    "Third and final body paragraph closing out the fixture document nicely.",
]


def test_is_odt_gates_on_stored_mimetype():
    blob = build_odt(paragraphs=_PARAS)
    assert is_odt(blob)
    assert not is_odt(b"application/vnd.oasis.opendocument.text outside a zip")
    assert not is_odt(None)
    assert not is_odt("a string, not bytes")
    # a zip without the leading stored mimetype member is not an ODT
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("content.xml", "<x/>")
    assert not is_odt(buf.getvalue())
    # an EPUB (also a stored-mimetype zip) must not gate as ODT
    from toyocr_spark.fixtures.genepub import build_epub

    assert not is_odt(build_epub(["<html><body><p>chapter text</p></body></html>"]))


def test_odt_paragraphs_extract_in_document_order():
    r = extract(build_odt(paragraphs=_PARAS))
    assert r.text == "\n".join(_PARAS)
    assert r.n_kept == 3 and r.n_blocks == 3
    for (s, e, kind), p in zip(r.spans, _PARAS):
        assert r.text[s:e] == p and kind == "text"


def test_odt_headers_footers_and_nav_links_are_boilerplate():
    """Page headers/footers live in styles.xml master pages (never
    read — the structural strip); link-dominated paragraphs die by
    link density in the shared scorer."""
    body = [
        paragraph("Home | Products | About us | Contact", link="https://nav.example/"),
        paragraph("Main content paragraph number one, long enough to stand by itself."),
        paragraph("Main content paragraph number two, also comfortably over the bar."),
    ]
    blob = build_odt(
        body_xml=body,
        header_text="CONFIDENTIAL draft header",
        footer_text="page 1 of 99 footer",
    )
    r = extract(blob)
    assert "CONFIDENTIAL" not in r.text and "footer" not in r.text
    assert "Home |" not in r.text
    assert r.n_blocks == 3 and r.n_kept == 2
    # the content IS in the container — exclusion is a choice
    assert b"CONFIDENTIAL draft header" in blob


def test_odt_inline_footnotes_are_skipped_but_tails_continue():
    """ODF notes are INLINE in content.xml (unlike docx's separate
    part): the subtree is skipped, the sentence around the anchor
    stays whole."""
    body = [
        "<text:p>Noted claim"
        + note("the hidden footnote body text")
        + " continues after the anchor, long enough to be kept.</text:p>",
    ]
    r = extract(build_odt(body_xml=body))
    assert r.text == "Noted claim continues after the anchor, long enough to be kept."
    assert "hidden footnote" not in r.text


def test_odt_headings_and_span_fragmentation():
    body = [
        paragraph(["Annual", " summary ", "of operations"], heading=1),
        paragraph("Body paragraph following the heading, long enough to be kept."),
    ]
    blocks = tokenize_odt(build_odt(body_xml=body))
    assert blocks[0].text == "Annual summary of operations"
    assert blocks[0].kind == "title" and blocks[0].n_inline == 2
    assert blocks[1].kind == "text"
    r = extract(build_odt(body_xml=body))
    assert r.spans[0][2] == "title"


def test_odt_tables_walk_in_row_major_order():
    body = [
        table(
            [
                ["alpha cell with enough characters here", "beta cell also long enough"],
                ["gamma cell long enough to register", "delta cell with characters too"],
            ]
        )
    ]
    blocks = tokenize_odt(build_odt(body_xml=body))
    assert [b.text.split()[0] for b in blocks] == ["alpha", "beta", "gamma", "delta"]
    assert all(b.tag_path == ("odt", "tbl", "p") for b in blocks)


def test_odt_whitespace_tokens_and_escapes():
    body = [
        "<text:p>left<text:tab/>right<text:line-break/>below "
        "and<text:s text:c=\"3\"/>spaced AT&amp;T &lt;half&gt; padding chars</text:p>"
    ]
    blocks = tokenize_odt(build_odt(body_xml=body))
    assert blocks[0].text == "left right below and spaced AT&T <half> padding chars"


def test_odt_links_mines_absolute_targets_only():
    body = [
        paragraph("External standard reference here", link="https://ref-1.example/std"),
        paragraph("Relative sibling navigation link", link="../other.odt"),
        paragraph("Fragment anchor navigation link x", link="#section3"),
        paragraph("Second external reference thing", link="https://ref-2.example/p"),
    ]
    assert odt_links(build_odt(body_xml=body)) == [
        "https://ref-1.example/std",
        "https://ref-2.example/p",
    ]
    assert odt_links(b"PK\x03\x04 garbage") == []


def test_odt_malformed_containers_quiet_skip():
    blob = build_odt(paragraphs=_PARAS)
    assert tokenize_odt(blob[: len(blob) // 2]) == []
    bad_xml = build_odt(body_xml=["<text:p>unclosed"])
    assert tokenize_odt(bad_xml) == []
    rng = random.Random(929)
    for _ in range(80):
        fuzzed = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        first = extract(payload)
        assert extract(payload) == first


def test_odt_extraction_is_deterministic_and_byte_stable():
    a, b = build_odt(paragraphs=_PARAS), build_odt(paragraphs=_PARAS)
    assert a == b
    assert extract(a) == extract(b)


def test_odt_through_spark_pipeline(spark):
    from toyocr_spark.pipeline import extract_pages

    paras = [
        "Distributed extraction body paragraph one, well over the length bar.",
        "Distributed extraction body paragraph two, also well over the bar.",
    ]
    blob = build_odt(paragraphs=paras, header_text="junk header")
    rows = [(f"https://o{i}.example/x.odt", bytearray(blob)) for i in range(12)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r.url: r.extracted_text
        for r in extract_pages(pages.repartition(5)).collect()
    }
    assert len(got) == 12
    assert all(v == "\n".join(paras) for v in got.values())

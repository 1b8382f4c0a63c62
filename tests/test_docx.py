"""OOXML (.docx) extraction: container walk, WordprocessingML
tokenize, structural boilerplate exclusion, and the shared-kernel
dispatch — the same contract battery every other format carries
(reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.docx import is_docx, tokenize_docx
from toyocr_spark.fixtures.gendocx import build_docx, paragraph, table


def test_is_docx_gates_on_magic_and_main_part():
    blob = build_docx(paragraphs=["hello world document body text"])
    assert is_docx(blob)
    assert not is_docx(b"<html><body>word/document.xml</body></html>")
    assert not is_docx(b"%PDF-1.4 word/document.xml")
    assert not is_docx(None)
    assert not is_docx("a string, not bytes")
    # a real zip that is NOT a docx (no main part)
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data.txt", "just a zip")
    assert not is_docx(buf.getvalue())


def test_docx_paragraphs_extract_in_document_order():
    paras = [
        "First paragraph with plenty of characters to clear the score threshold.",
        "Second paragraph, also long enough to be kept by the density rules here.",
        "Third and final body paragraph closing out the fixture document nicely.",
    ]
    r = extract(build_docx(paragraphs=paras))
    assert r.text == "\n".join(paras)
    assert r.n_kept == 3 and r.n_blocks == 3
    # spans are exact char offsets into the final text
    for (s, e, kind), p in zip(r.spans, paras):
        assert r.text[s:e] == p and kind == "text"


def test_docx_headers_footers_and_nav_links_are_boilerplate():
    """Headers/footers live in separate parts (never read — the
    structural strip); link-dominated paragraphs die by link density
    in the shared scorer."""
    body = [
        paragraph("Home | Products | About us | Contact", link="rId9"),
        paragraph("Main content paragraph number one, long enough to stand by itself."),
        paragraph("Main content paragraph number two, also comfortably over the bar."),
    ]
    blob = build_docx(
        body_xml=body,
        header_text="CONFIDENTIAL draft header",
        footer_text="page 1 of 99 footer",
    )
    r = extract(blob)
    assert "CONFIDENTIAL" not in r.text and "footer" not in r.text
    assert "Home |" not in r.text
    assert r.n_blocks == 3 and r.n_kept == 2
    # the parts ARE in the container (the exclusion is a choice, not a
    # parse failure)
    assert b"word/header1.xml" in blob and b"word/footer1.xml" in blob


def test_docx_heading_styles_and_run_fragmentation():
    body = [
        paragraph(["Annual", " summary ", "of operations"], style="Heading1"),
        paragraph("Body paragraph following the heading, long enough to be kept."),
    ]
    blocks = tokenize_docx(build_docx(body_xml=body))
    assert blocks[0].text == "Annual summary of operations"
    assert blocks[0].kind == "title" and blocks[0].n_inline == 2
    assert blocks[1].kind == "text"
    r = extract(build_docx(body_xml=body))
    assert r.spans[0][2] == "title"


def test_docx_tables_walk_in_row_major_order():
    body = [
        table(
            [
                ["alpha cell content goes here", "beta cell content goes here"],
                ["gamma cell content goes here", "delta cell content goes here"],
            ]
        )
    ]
    blocks = tokenize_docx(build_docx(body_xml=body))
    assert [b.text.split()[0] for b in blocks] == ["alpha", "beta", "gamma", "delta"]
    assert all(b.tag_path == ("docx", "tbl", "p") for b in blocks)


def test_docx_xml_escapes_and_whitespace_normalize():
    text = "AT&T < half > the price,  double  spaced\ttabbed"
    r = extract(build_docx(paragraphs=[text]))
    assert r.text == "AT&T < half > the price, double spaced tabbed"


def test_docx_tab_and_break_separate_words():
    body = [
        "<w:p><w:r><w:t>left</w:t><w:tab/><w:t>right</w:t><w:br/>"
        "<w:t>below and some padding characters to clear scoring</w:t></w:r></w:p>"
    ]
    blocks = tokenize_docx(build_docx(body_xml=body))
    assert blocks[0].text.startswith("left right below")


def test_docx_malformed_containers_quiet_skip():
    """Truncation, bit flips, bad XML: tokenize to [] or decode
    deterministically — never raise (the fuzz discipline)."""
    blob = build_docx(
        paragraphs=["body paragraph long enough to be kept by the scoring pass"]
    )
    assert tokenize_docx(blob[: len(blob) // 2]) == []
    bad_xml = build_docx(body_xml=["<w:p><w:r><w:t>unclosed"])
    assert tokenize_docx(bad_xml) == []
    rng = random.Random(929)
    for _ in range(80):
        fuzzed = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        first = extract(payload)
        assert extract(payload) == first


def test_docx_extraction_is_deterministic_and_byte_stable():
    paras = ["stable fixture paragraph with enough characters to be kept"]
    a, b = build_docx(paragraphs=paras), build_docx(paragraphs=paras)
    assert a == b
    assert extract(a) == extract(b)


def test_opc_core_properties_round_trip_all_three_formats():
    """docProps/core.xml is format-independent: ONE harvester serves
    docx/xlsx/pptx (the q43/q113 metadata-family discipline — read one
    small zip member, never parse content). Stable key order, XML
    escapes round-trip, missing part and garbage quiet-skip."""
    from toyocr_spark.extractor.opc import opc_core_properties
    from toyocr_spark.fixtures.genpptx import build_pptx, shape
    from toyocr_spark.fixtures.genxlsx import build_xlsx

    props = {
        "title": "Quarterly <Report> & Co",
        "creator": "a. writer",
        "created": "2024-03-01T10:00:00Z",
        "revision": "7",
    }
    want = [
        ("title", "Quarterly <Report> & Co"),
        ("creator", "a. writer"),
        ("revision", "7"),
        ("created", "2024-03-01T10:00:00Z"),
    ]
    blobs = [
        build_docx(paragraphs=["body text long enough to be kept ok"], core_props=props),
        build_xlsx({"s": [["row text long enough to be kept ok"]]}, core_props=props),
        build_pptx(slides=[[shape(["slide text long enough to be kept"])]], core_props=props),
    ]
    for blob in blobs:
        assert opc_core_properties(blob) == want
        assert extract(blob).text  # the extra part never disturbs extraction
    assert opc_core_properties(build_docx(paragraphs=["x" * 50])) == []
    assert opc_core_properties(b"not a zip at all") == []
    import random as _r

    rng = _r.Random(31415)
    base = blobs[0]
    for _ in range(40):
        fuzzed = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        assert opc_core_properties(payload) == opc_core_properties(payload)


def test_docx_through_spark_pipeline(spark):
    """The kernel dispatch is transparent to the pipeline: docx pages
    ride the same mapInArrow extraction as HTML/PDF, byte-identically
    across partitionings."""
    from toyocr_spark.pipeline import extract_pages

    paras = [
        "Distributed extraction body paragraph one, well over the length bar.",
        "Distributed extraction body paragraph two, also well over the bar.",
    ]
    blob = build_docx(paragraphs=paras, header_text="junk header")
    rows = [(f"https://d{i}.example/x.docx", bytearray(blob)) for i in range(12)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r.url: r.extracted_text
        for r in extract_pages(pages.repartition(5)).collect()
    }
    assert len(got) == 12
    assert all(v == "\n".join(paras) for v in got.values())

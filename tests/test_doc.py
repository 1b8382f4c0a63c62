"""Legacy binary Word (.doc) extraction: CFB container walk, piece
table (both encodings, cross-piece paragraphs), structural subdocument
exclusion, HYPERLINK field accounting, STSH/PAPX styles, and the
shared-kernel dispatch — the same contract battery every other format
carries (reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random
import struct

from toyocr_spark.extractor.cfb import CFB_MAGIC, CfbFile
from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.doc import doc_links, is_doc, tokenize_doc
from toyocr_spark.fixtures.gendoc import build_cfb, build_doc, para

_PARAS = [
    "First paragraph with plenty of characters to clear the score threshold.",
    "Second paragraph, also long enough to be kept by the density rules here.",
    "Third and final body paragraph closing out the fixture document nicely.",
]


def test_is_doc_gates_on_cfb_magic_and_word_stream():
    blob = build_doc(_PARAS)
    assert is_doc(blob)
    assert not is_doc(b"WordDocument without the container magic")
    assert not is_doc(CFB_MAGIC + b"no word stream name in utf-16 here")
    assert not is_doc(None)
    assert not is_doc("a string, not bytes")
    # a real CFB that is NOT a .doc (no WordDocument stream): the gate
    # discriminates within the compound-file family (.xls/.ppt)
    xls = build_cfb([("Workbook", b"\x09\x08" + b"\x00" * 5000)])
    assert CfbFile(xls).has_stream("Workbook") and not is_doc(xls)


def test_doc_paragraphs_extract_in_cp_order():
    r = extract(build_doc(_PARAS))
    assert r.text == "\n".join(_PARAS)
    assert r.n_kept == 3 and r.n_blocks == 3
    for (s, e, kind), p in zip(r.spans, _PARAS):
        assert r.text[s:e] == p and kind == "text"


def test_doc_both_piece_encodings_and_cross_piece_paragraphs():
    """Every paragraph > 48 chars is deliberately laid as a cp1252
    piece + a UTF-16 piece (gendoc), so this battery exercises the
    mixed-encoding cross-piece walk on every fixture; a forced-unicode
    short paragraph covers the pure-UTF-16 path, including chars with
    no cp1252 image."""
    paras = [
        para("short ascii paragraph kept simple", unicode=False),
        para("Unicode café naïve déjà vu — résumé ‹quoted› ™", unicode=True),
        para("Smart \u201cquotes\u201d and en–dash stay intact across the piece split boundary right here."),
    ]
    blocks = tokenize_doc(build_doc(paras))
    assert blocks[0].text == "short ascii paragraph kept simple"
    assert blocks[1].text == "Unicode café naïve déjà vu — résumé ‹quoted› ™"
    assert blocks[2].text.startswith("Smart \u201cquotes\u201d and en–dash stay intact")


def test_doc_headers_footers_and_hyperlink_nav_are_boilerplate():
    """Header/footer text lives AFTER ccpText in CP space (structural
    exclusion — the docx never-read-the-part twin); a HYPERLINK-field
    nav paragraph dies by the shared link-density rule."""
    paras = [
        para("Home | Products | About us | Contact", link="https://nav-0.example/"),
        para("Main content paragraph number one, long enough to stand by itself."),
        para("Main content paragraph number two, also comfortably over the bar."),
    ]
    blob = build_doc(
        paras,
        header_text="CONFIDENTIAL draft header",
        footer_text="page 1 of 99 footer",
    )
    r = extract(blob)
    assert "CONFIDENTIAL" not in r.text and "footer" not in r.text
    assert "Home |" not in r.text
    assert r.n_blocks == 3 and r.n_kept == 2
    # the subdocument text IS in the container (exclusion is a choice,
    # not a parse failure): it sits in the piece table past ccpText
    assert "CONFIDENTIAL draft header".encode("cp1252") in blob


def test_doc_heading_styles_via_stsh_and_papx():
    paras = [
        para("Annual summary of operations", style="Heading1"),
        para("Body paragraph following the heading, long enough to be kept."),
        para("Appendix heading nine", style="Heading9"),
    ]
    blocks = tokenize_doc(build_doc(paras))
    assert [b.kind for b in blocks] == ["title", "text", "title"]
    r = extract(build_doc(paras))
    assert r.spans[0][2] == "title"


def test_doc_table_cell_marks_route_to_table_tag_path():
    paras = [
        para("row one cell alpha with enough characters", cell=True),
        para("row one cell beta also has enough characters", cell=True),
        para("A plain paragraph outside of the table machinery here."),
    ]
    blocks = tokenize_doc(build_doc(paras))
    assert blocks[0].tag_path == ("doc", "tbl", "p")
    assert blocks[1].tag_path == ("doc", "tbl", "p")
    assert blocks[2].tag_path == ("doc", "p")


def test_doc_tab_and_line_break_separate_words_and_whitespace_normalizes():
    r = extract(build_doc(["left\tright\x0bbelow,  double  spaced padding to clear scoring"]))
    assert r.text == "left right below, double spaced padding to clear scoring"


def test_doc_field_instruction_text_is_scanned_not_emitted():
    paras = [
        para("Visit the standards portal today", link="https://ref.example/std"),
        para("Body text long enough that the density selector keeps it around."),
    ]
    blocks = tokenize_doc(build_doc(paras))
    assert blocks[0].text == "Visit the standards portal today"
    assert "HYPERLINK" not in blocks[0].text
    assert blocks[0].link_chars == len(blocks[0].text)
    assert blocks[1].link_chars == 0


def test_doc_links_mines_absolute_targets_only():
    paras = [
        para("External standard reference", link="https://ref-1.example/std"),
        para("Bookmark jump", link="\\l section3"),  # navigation, not an edge
        para("Local path", link="C:/docs/local.doc"),  # schemeless: drop
        para("Second external", link="https://ref-2.example/page"),
    ]
    assert doc_links(build_doc(paras)) == [
        "https://ref-1.example/std",
        "https://ref-2.example/page",
    ]
    assert doc_links(b"\xd0\xcf\x11\xe0 garbage") == []


def test_doc_0table_variant_and_prc_skip():
    """FIB.fWhichTblStm routes to 0Table; a Prc block ahead of the
    Pcdt must be skipped (both are defaults of gendoc's twin knobs)."""
    blob = build_doc(_PARAS, table_name="0Table", prc_junk=True)
    assert CfbFile(blob).has_stream("0Table")
    assert extract(blob).text == "\n".join(_PARAS)
    no_junk = build_doc(_PARAS, prc_junk=False)
    assert extract(no_junk).text == "\n".join(_PARAS)


def test_cfb_mini_and_main_fat_paths_both_live():
    """The table stream sits under the 4096 cutoff (ministream +
    miniFAT); WordDocument is padded above it (main FAT chain) — every
    fixture exercises both read paths. Also: stream bytes round-trip
    exactly through the writer/reader pair."""
    payload_small = b"small stream payload" * 3
    payload_big = b"B" * 5000
    blob = build_cfb([("Small", payload_small), ("Big", payload_big)])
    cfb = CfbFile(blob)
    assert cfb.stream("Small") == payload_small
    assert cfb.stream("Big") == payload_big
    assert sorted(cfb.names()) == ["Big", "Small"]

    doc = build_doc(_PARAS)
    cfb2 = CfbFile(doc)
    word = cfb2.stream("WordDocument")
    table = cfb2.stream("1Table")
    assert len(word) >= 4096 and len(table) < 4096
    assert struct.unpack_from("<H", word, 0)[0] == 0xA5EC


def test_doc_malformed_containers_quiet_skip():
    """Truncation, bit flips, garbage behind the magic: tokenize to []
    or decode deterministically — never raise (the fuzz discipline)."""
    blob = build_doc(_PARAS)
    assert tokenize_doc(blob[: len(blob) // 2]) == []
    assert tokenize_doc(CFB_MAGIC + bytes(1024)) == []
    rng = random.Random(929)
    for _ in range(120):
        fuzzed = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        first = extract(payload)
        assert extract(payload) == first


def test_doc_extraction_is_deterministic_and_byte_stable():
    a, b = build_doc(_PARAS), build_doc(_PARAS)
    assert a == b
    assert extract(a) == extract(b)


def test_doc_through_spark_pipeline(spark):
    """.doc pages ride the same mapInArrow extraction as HTML/PDF,
    byte-identically across partitionings."""
    from toyocr_spark.pipeline import extract_pages

    paras = [
        "Distributed extraction body paragraph one, well over the length bar.",
        "Distributed extraction body paragraph two, also well over the bar.",
    ]
    blob = build_doc(paras, header_text="junk header")
    rows = [(f"https://d{i}.example/x.doc", bytearray(blob)) for i in range(12)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r.url: r.extracted_text
        for r in extract_pages(pages.repartition(5)).collect()
    }
    assert len(got) == 12
    assert all(v == "\n".join(paras) for v in got.values())

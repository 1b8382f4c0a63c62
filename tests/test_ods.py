"""OpenDocument Spreadsheet (.ods) extraction: ODF package gate,
content.xml table walk, column/row repeat RLE (with the zip-bomb
clamp), covered-cell merges, inline annotations, header-row
containers, and the shared-kernel dispatch — the test_xls/test_xlsx
battery on the ODF spreadsheet carrier (reference analogue: the
byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.ods import MAX_REPEAT, is_ods, tokenize_ods
from toyocr_spark.fixtures.genods import build_ods, covered, row

_SHEETS = {
    "report": [
        ["Quarterly report header row with words"],
        ["Revenue by region grew steadily across the period", "12345", "3.5"],
        ["Costs line with some prose attached to it here", "-7"],
    ]
}


def test_is_ods_gates_on_mimetype_and_formats_disjoint():
    blob = build_ods(_SHEETS)
    assert is_ods(blob)
    assert not is_ods(b"application/vnd.oasis.opendocument.spreadsheet no zip")
    assert not is_ods(None)
    assert not is_ods("a string, not bytes")
    # the ODF family discriminates all three ways
    from toyocr_spark.extractor.odp import is_odp
    from toyocr_spark.extractor.odt import is_odt
    from toyocr_spark.fixtures.genodt import build_odt, paragraph

    assert not is_odt(blob) and not is_odp(blob)
    odt = build_odt(body_xml=[paragraph("a text document paragraph here")])
    assert not is_ods(odt)


def test_ods_rows_extract_like_the_xlsx_twin():
    """Same workbook content through ODF and OOXML must extract
    identical text — the two carriers of one format family (the
    BIFF8-vs-OOXML cross-check, third carrier)."""
    from toyocr_spark.fixtures.genxlsx import build_xlsx

    content = {
        "report": [
            ["Sheet header row with plenty of words"],
            ["Prose row one long enough to be kept by the scorer", "77"],
            ["Prose row two also long enough to be kept here", "3.5"],
        ]
    }
    assert extract(build_ods(content)).text == extract(build_xlsx(content)).text
    assert extract(build_ods(content)).spans == extract(build_xlsx(content)).spans


def test_ods_first_row_is_title_and_numeral_sheets_die():
    sheets = {
        "data": [
            ["Header prose row with enough words to matter"],
            ["A real prose row long enough to clear the scoring bar", "5"],
        ],
        "chrome": [["1", "2"], ["3", "4"], ["5", "6"]],  # bare numerals: all die
    }
    r = extract(build_ods(sheets))
    assert "Header prose row" in r.text
    assert r.spans[0][2] == "title"
    assert "1 2" not in r.text and "3 4" not in r.text


def test_ods_column_repeat_expands_and_covered_cells_skip():
    """table:number-columns-repeated is ODF's RLE cell model — a cell
    stored once renders k times; covered-table-cell merge continuations
    contribute nothing."""
    blocks = tokenize_ods(
        build_ods(
            {
                "s": [
                    ["Header row long enough to take the title slot"],
                    [
                        {"text": "prose cell before the repeated run here"},
                        {"text": "ha", "repeat": 3},
                        covered(),
                        {"text": "tail"},
                    ],
                ]
            }
        )
    )
    assert blocks[1].text == (
        "prose cell before the repeated run here ha ha ha tail"
    )


def test_ods_repeat_attributes_clamp_like_bounded_inflate():
    """A million-fold repeat on a TEXT row/cell is this format's zip
    bomb; both axes clamp at MAX_REPEAT so output stays bounded."""
    wide = build_ods(
        {"s": [[{"text": "wide prose cell repeated absurdly", "repeat": 10**6}]]}
    )
    tall = build_ods(
        {"s": [row(["tall prose row repeated absurdly often here"], repeat=10**6)]}
    )
    wb = tokenize_ods(wide)
    tb = tokenize_ods(tall)
    assert len(wb) == 1 and wb[0].text.count("wide prose cell") == MAX_REPEAT
    assert len(tb) == MAX_REPEAT
    # malformed repeat values degrade to 1, never raise
    junk = build_ods({"s": [[{"text": "prose with a junk repeat", "repeat": 1}]]})
    junk = junk.replace(b'repeated="1"', b'repeated="x"')
    assert is_ods(junk)  # still gates; repeat parse just defaults


def test_ods_annotations_skip_and_header_rows_descend():
    blob = build_ods(
        {
            "s": [
                [
                    {
                        "text": "Annotated header row with plenty of words",
                        "annotation": "reviewer note junk never extract this",
                    }
                ],
                ["Body prose row long enough to clear the scoring bar"],
            ]
        },
        header_rows=1,
    )
    r = extract(blob)
    assert "Annotated header row" in r.text
    assert "reviewer note junk" not in r.text
    assert r.spans[0][2] == "title"  # header-row container still first


def test_ods_link_chars_feed_the_scorer():
    blocks = tokenize_ods(
        build_ods(
            {
                "s": [
                    [
                        {
                            "text": "linked cell text",
                            "link": "https://elsewhere.example/t",
                        },
                        {"text": "plain sibling cell"},
                    ]
                ]
            }
        )
    )
    assert blocks[0].link_chars == len("linked cell text")
    assert blocks[0].text == "linked cell text plain sibling cell"


def test_ods_malformed_containers_quiet_skip():
    blob = build_ods(_SHEETS)
    assert tokenize_ods(blob[: len(blob) // 2]) == []
    assert tokenize_ods(b"PK\x03\x04 not actually a zip archive") == []
    rng = random.Random(1831)
    for _ in range(120):
        fuzzed = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        first = extract(payload)
        assert extract(payload) == first


def test_ods_extraction_is_deterministic_and_byte_stable():
    a, b = build_ods(_SHEETS), build_ods(_SHEETS)
    assert a == b
    assert extract(a) == extract(b)


def test_odf_trio_outlinks_through_mine_outlinks(spark):
    """The JVM container gate matches the opendocument mimetype PREFIX
    so every ODF subtype routes to the kernel leg, where odt_links
    serves the trio (text:a is ODF-wide, content.xml in all three)."""
    from toyocr_spark.fixtures.genodp import build_odp, frame
    from toyocr_spark.functions.linkmine import mine_outlinks

    ods = build_ods(
        {"s": [[{"text": "linked cell", "link": "https://ext.example/from-ods"}]]}
    )
    odp = build_odp(
        slides=[
            {"frames_xml": [frame([("linked para", "https://ext.example/from-odp")])]}
        ]
    )
    pages = spark.createDataFrame(
        [
            ("https://a.example/book.ods", bytearray(ods)),
            ("https://b.example/deck.odp", bytearray(odp)),
        ],
        "url string, html binary",
    )
    got = {(r.src_url, r.target) for r in mine_outlinks(pages).collect()}
    assert got == {
        ("https://a.example/book.ods", "https://ext.example/from-ods"),
        ("https://b.example/deck.odp", "https://ext.example/from-odp"),
    }


def test_ods_through_spark_pipeline(spark):
    from toyocr_spark.pipeline import extract_pages

    blob = build_ods(_SHEETS)
    want = extract(blob).text
    assert want
    rows = [(f"https://x{i}.example/book.ods", bytearray(blob)) for i in range(12)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r.url: r.extracted_text
        for r in extract_pages(pages.repartition(5)).collect()
    }
    assert len(got) == 12
    assert all(v == want for v in got.values())

"""Legacy binary Excel (.xls / BIFF8) extraction: CFB walk, BIFF
record machine, SST shared-string indirection (with CONTINUE spills
and mid-string encoding flips), packed RK/MULRK numerics, and the
shared-kernel dispatch — the same contract battery every other format
carries (reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.xls import is_xls, tokenize_xls
from toyocr_spark.fixtures.gendoc import build_cfb
from toyocr_spark.fixtures.genxls import build_xls

_SHEETS = {
    "report": [
        ["Quarterly report header row with words"],
        ["Revenue by region grew steadily across the period", 12345, 3.5],
        ["Costs line with some prose attached to it here", -7],
    ]
}


def test_is_xls_gates_on_cfb_magic_and_workbook_stream():
    blob = build_xls(_SHEETS)
    assert is_xls(blob)
    assert not is_xls(b"Workbook without the container magic")
    assert not is_xls(None)
    assert not is_xls("a string, not bytes")
    # the CFB family discriminates both ways: a .doc is not a .xls and
    # a .xls is not a .doc
    from toyocr_spark.extractor.doc import is_doc
    from toyocr_spark.fixtures.gendoc import build_doc

    assert not is_xls(build_doc(["a word document paragraph long enough here"]))
    assert not is_doc(blob)


def test_xls_rows_extract_like_the_xlsx_twin():
    """Same workbook content through BIFF8 and OOXML must extract
    identical text — the two carriers of one format family."""
    from toyocr_spark.fixtures.genxlsx import build_xlsx

    content = {
        "report": [
            ["Sheet header row with plenty of words"],
            ["Prose row one long enough to be kept by the scorer", "77"],
            ["Prose row two also long enough to be kept here", "3.5"],
        ]
    }
    old = build_xls(
        {
            n: [
                [int(c) if isinstance(c, str) and c.isdigit() else
                 (float(c) if isinstance(c, str) and c.replace(".", "", 1).isdigit() else c)
                 for c in row]
                for row in rows
            ]
            for n, rows in content.items()
        }
    )
    new = build_xlsx(content)
    assert extract(old).text == extract(new).text
    assert extract(old).spans == extract(new).spans


def test_xls_first_row_is_title_and_numeral_rows_die():
    sheets = {
        "data": [
            ["Header prose row with enough words to matter"],
            ["A real prose row long enough to clear the scoring bar", 5],
        ],
        "chrome": [[1, 2], [3, 4], [5, 6]],  # bare-numeral sheet: all die
    }
    r = extract(build_xls(sheets))
    assert "Header prose row" in r.text
    assert r.spans[0][2] == "title"
    assert "1 2" not in r.text and "3 4" not in r.text


def test_xls_sst_continue_spill_with_encoding_flip():
    """A string whose character run crosses into a CONTINUE record
    restarts with a fresh flags byte that here FLIPS the encoding —
    the hardest legal SST shape; text must be identical either way."""
    a = tokenize_xls(build_xls(_SHEETS, continue_split=False))
    b = tokenize_xls(build_xls(_SHEETS, continue_split=True))
    assert [x.text for x in a] == [x.text for x in b]
    assert a[0].text == "Quarterly report header row with words"


def test_xls_unicode_strings_and_packed_numerics():
    sheets = {
        "s": [
            ["Unicode naïve café résumé – entry stays intact in the sheet"],
            ["run of rk ints follows this prose cell", 7, 8, 9],
            ["big int falls back to NUMBER record", 2**40],
            ["negative and float cells here too", -5, 2.25],
        ]
    }
    blocks = tokenize_xls(build_xls(sheets))
    assert blocks[0].text == "Unicode naïve café résumé – entry stays intact in the sheet"
    assert blocks[1].text.endswith("7 8 9")
    assert blocks[2].text.endswith("1099511627776")
    assert blocks[3].text.endswith("-5 2.25")


def test_xls_malformed_containers_quiet_skip():
    blob = build_xls(_SHEETS)
    assert tokenize_xls(blob[: len(blob) // 2]) == []
    assert tokenize_xls(build_cfb([("Workbook", b"\x00" * 600)])) == []
    rng = random.Random(929)
    for _ in range(120):
        fuzzed = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        first = extract(payload)
        assert extract(payload) == first


def test_xls_extraction_is_deterministic_and_byte_stable():
    a, b = build_xls(_SHEETS), build_xls(_SHEETS)
    assert a == b
    assert extract(a) == extract(b)


def test_xls_through_spark_pipeline(spark):
    from toyocr_spark.pipeline import extract_pages

    blob = build_xls(_SHEETS)
    want = extract(blob).text
    assert want
    rows = [(f"https://x{i}.example/wb.xls", bytearray(blob)) for i in range(12)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r.url: r.extracted_text
        for r in extract_pages(pages.repartition(5)).collect()
    }
    assert len(got) == 12
    assert all(v == want for v in got.values())

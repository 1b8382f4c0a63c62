"""OOXML SpreadsheetML (.xlsx) extraction: workbook/rels/sheet walk,
sharedStrings indirection, row-level blocks through the shared scorer,
and the fuzz contract — the same battery as test_docx.py."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.xlsx import is_xlsx, tokenize_xlsx
from toyocr_spark.fixtures.genxlsx import build_xlsx


def test_is_xlsx_gates_on_magic_and_workbook_part():
    blob = build_xlsx({"s": [["hello worksheet body text cell"]]})
    assert is_xlsx(blob)
    assert not is_xlsx(b"<html>xl/workbook.xml</html>")
    assert not is_xlsx(None)
    # a docx is NOT an xlsx and vice versa
    from toyocr_spark.extractor.docx import is_docx
    from toyocr_spark.fixtures.gendocx import build_docx

    docx = build_docx(paragraphs=["some body paragraph text goes here"])
    assert not is_xlsx(docx) and is_docx(docx)
    assert not is_docx(blob)


def test_xlsx_rows_extract_with_shared_string_indirection():
    rows = [
        ["quarter", "revenue by region", "notes for the reader"],
        ["first quarter results for the northern region", 1250, "strong growth"],
        ["second quarter results for the southern region", 980, "monsoon dip"],
    ]
    blob = build_xlsx({"report": rows})
    # the repeated strings really are indirected: each appears once
    assert blob.count(b"first quarter results") == 1
    blocks = tokenize_xlsx(blob)
    assert [b.kind for b in blocks] == ["title", "text", "text"]
    r = extract(blob)
    assert r.text == (
        "quarter revenue by region notes for the reader\n"
        "first quarter results for the northern region 1250 strong growth\n"
        "second quarter results for the southern region 980 monsoon dip"
    )
    assert r.n_kept == 3


def test_xlsx_sheets_walk_in_workbook_order():
    blob = build_xlsx(
        {
            "alpha": [["alpha sheet first row content goes here"]],
            "beta": [["beta sheet first row content goes here too"]],
        }
    )
    blocks = tokenize_xlsx(blob)
    assert [b.text.split()[0] for b in blocks] == ["alpha", "beta"]
    # first row of EACH sheet is the header-convention title
    assert [b.kind for b in blocks] == ["title", "title"]


def test_xlsx_numeral_chrome_rows_are_dropped():
    """Short bare-numeral rows (spreadsheet chrome) die by MIN_CHARS
    in the shared scorer; the prose rows survive."""
    blob = build_xlsx(
        {
            "data": [
                ["narrative description of the dataset and its provenance"],
                ["observations collected across the survey period in full"],
            ],
            "totals": [[7, 42], [1, 2]],
        }
    )
    r = extract(blob)
    assert "7 42" not in r.text and "1 2" not in r.text
    assert r.n_kept == 2 and r.n_blocks == 4


def test_xlsx_malformed_containers_quiet_skip():
    blob = build_xlsx({"s": [["row content long enough to be kept today"]]})
    assert tokenize_xlsx(blob[: len(blob) // 3]) == []
    rng = random.Random(1331)
    for _ in range(60):
        fuzzed = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        first = extract(payload)
        assert extract(payload) == first


def test_xlsx_out_of_range_shared_index_skips_cell():
    blob = build_xlsx({"s": [["anchor text that is long enough to keep"]]})
    # corrupt the shared-string index to 99 (out of range)
    bad = blob.replace(b't="s"><v>0</v>', b't="s"><v>99</v>')
    assert tokenize_xlsx(bad) == []  # only cell skipped -> empty row -> no blocks
    assert extract(bad).text == ""


def test_xlsx_through_spark_pipeline(spark):
    from toyocr_spark.pipeline import extract_pages

    rows_fixture = [
        ["ledger entry description column for the fixture"],
        ["one line of prose describing the first ledger entry"],
    ]
    blob = build_xlsx({"ledger": rows_fixture})
    rows = [(f"https://x{i}.example/b.xlsx", bytearray(blob)) for i in range(8)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r.extracted_text for r in extract_pages(pages.repartition(3)).collect()}
    want = "\n".join(" ".join(r) for r in rows_fixture)
    assert len(got) == 8 and all(v == want for v in got.values())

"""EPUB extraction: OCF container walk, spine reading order (the
part-name trap), HTML-tokenizer reuse per chapter, nav-doc chrome
dying by link density, and the fuzz contract."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.epub import is_epub, tokenize_epub
from toyocr_spark.fixtures.genepub import build_epub, chapter_html


def _book():
    return build_epub(
        [
            chapter_html(
                "Chapter One Title Goes Here",
                [
                    "First chapter paragraph with plenty of characters to clear scoring.",
                    "Another paragraph in the first chapter, also long enough to be kept.",
                ],
            ),
            chapter_html(
                "Chapter Two Title Goes Here",
                ["Second chapter paragraph, comfortably over the keep threshold too."],
            ),
        ]
    )


def test_is_epub_gates_and_formats_disjoint():
    blob = _book()
    assert is_epub(blob)
    from toyocr_spark.extractor.docx import is_docx
    from toyocr_spark.extractor.pptx import is_pptx
    from toyocr_spark.extractor.xlsx import is_xlsx

    assert not (is_docx(blob) or is_xlsx(blob) or is_pptx(blob))
    assert not is_epub(b"<html>META-INF/container.xml</html>")
    assert not is_epub(None)
    # the OCF mimetype member really is first and stored
    assert blob.index(b"application/epub+zip") < 128


def test_epub_chapters_extract_in_spine_order_not_part_name_order():
    """Chapter 1 is stored in chapter2.xhtml and vice versa; only the
    spine idref walk reads the book forwards. The HTML tokenizer runs
    unchanged inside, so each chapter contributes its <title> block,
    <h1>, and paragraphs exactly as a standalone page would."""
    blob = _book()
    assert b"chapter2.xhtml" in blob
    r = extract(blob)
    assert r.text == (
        "Chapter One Title Goes Here\n"
        "Chapter One Title Goes Here\n"
        "First chapter paragraph with plenty of characters to clear scoring.\n"
        "Another paragraph in the first chapter, also long enough to be kept.\n"
        "Chapter Two Title Goes Here\n"
        "Chapter Two Title Goes Here\n"
        "Second chapter paragraph, comfortably over the keep threshold too."
    )
    assert r.spans[0][2] == "title"


def test_epub_nav_doc_dies_by_link_density():
    """The EPUB3 nav document sits in the spine as a list of links —
    no special case: the ordinary link-density rule drops it."""
    blob = _book()
    assert b"nav.xhtml" in blob
    r = extract(blob)
    assert "ch 1" not in r.text and "ch 2" not in r.text


def test_epub_malformed_containers_quiet_skip():
    blob = _book()
    assert tokenize_epub(blob[: len(blob) // 3]) == []
    rng = random.Random(2718)
    for _ in range(60):
        fuzzed = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        first = extract(payload)
        assert extract(payload) == first


def test_epub_through_spark_pipeline(spark):
    from toyocr_spark.pipeline import extract_pages

    blob = build_epub(
        [chapter_html("", ["Single chapter body paragraph long enough to keep."])],
        include_nav=False,
    )
    rows = [(f"https://e{i}.example/book.epub", bytearray(blob)) for i in range(6)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r.extracted_text for r in extract_pages(pages.repartition(3)).collect()}
    assert len(got) == 6
    assert all(
        v == "Single chapter body paragraph long enough to keep." for v in got.values()
    )

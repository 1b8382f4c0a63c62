"""OOXML PresentationML (.pptx) extraction: sldIdLst slide ordering
(the part-name trap), DrawingML run walk, title placeholders, speaker
notes exclusion, and the fuzz contract — the test_docx/test_xlsx
battery on the deck format."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.pptx import is_pptx, tokenize_pptx
from toyocr_spark.fixtures.genpptx import build_pptx, shape


def _deck():
    return build_pptx(
        slides=[
            [
                shape(["Opening slide title for the extraction deck"], title=True),
                shape(
                    [
                        "First bullet with enough characters to be kept around",
                        "Second bullet also long enough to stay in the extract",
                    ]
                ),
            ],
            [
                shape(["Second slide heading for the wrap-up section"], title=True),
                shape(["Closing remark paragraph that is long enough to survive"]),
            ],
        ],
        notes=["speaker note junk never extract this", "more note junk"],
    )


def test_is_pptx_gates_and_formats_disjoint():
    blob = _deck()
    assert is_pptx(blob)
    from toyocr_spark.extractor.docx import is_docx
    from toyocr_spark.extractor.xlsx import is_xlsx

    assert not is_docx(blob) and not is_xlsx(blob)
    assert not is_pptx(b"<html>ppt/presentation.xml</html>")
    assert not is_pptx(None)


def test_pptx_slides_extract_in_sldidlst_order_not_part_name_order():
    """The fixture stores deck slide 1 in slide2.xml and vice versa —
    a reader walking part names extracts the deck backwards; the id
    list is the only correct order source."""
    blob = _deck()
    assert b"slides/slide2.xml" in blob  # the trap is actually planted
    r = extract(blob)
    assert r.text == (
        "Opening slide title for the extraction deck\n"
        "First bullet with enough characters to be kept around\n"
        "Second bullet also long enough to stay in the extract\n"
        "Second slide heading for the wrap-up section\n"
        "Closing remark paragraph that is long enough to survive"
    )
    assert r.spans[0][2] == "title" and r.spans[3][2] == "title"
    assert r.n_kept == 5


def test_pptx_speaker_notes_are_structurally_excluded():
    blob = _deck()
    assert b"ppt/notesSlides/notesSlide1.xml" in blob
    r = extract(blob)
    assert "speaker note" not in r.text and "note junk" not in r.text


def test_pptx_malformed_containers_quiet_skip():
    blob = _deck()
    assert tokenize_pptx(blob[: len(blob) // 3]) == []
    rng = random.Random(1717)
    for _ in range(60):
        fuzzed = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        first = extract(payload)
        assert extract(payload) == first


def test_pptx_through_spark_pipeline(spark):
    from toyocr_spark.pipeline import extract_pages

    blob = build_pptx(
        slides=[[shape(["One slide with one long paragraph of body text here"])]]
    )
    rows = [(f"https://p{i}.example/deck.pptx", bytearray(blob)) for i in range(6)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r.extracted_text for r in extract_pages(pages.repartition(3)).collect()}
    assert len(got) == 6
    assert all(v == "One slide with one long paragraph of body text here" for v in got.values())

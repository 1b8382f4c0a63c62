"""OpenDocument Presentation (.odp) extraction: ODF package gate,
draw:page / draw:frame walk, presentation:class title detection,
outline text:list descent, structural speaker-notes exclusion, and
the shared-kernel dispatch — the test_pptx battery on the ODF deck
carrier (reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.odp import is_odp, tokenize_odp
from toyocr_spark.fixtures.genodp import build_odp, frame


def _deck():
    return build_odp(
        slides=[
            {
                "title": "Opening slide title for the extraction deck",
                "body": [
                    "First bullet with enough characters to be kept around",
                    "Second bullet also long enough to stay in the extract",
                ],
                "notes": "speaker note junk never extract this",
            },
            {
                "title": "Second slide heading for the wrap-up section",
                "body": ["Closing remark paragraph that is long enough to survive"],
                "notes": "more note junk",
            },
        ],
        master_text="master chrome paragraph never extract either",
    )


def test_is_odp_gates_on_mimetype_and_formats_disjoint():
    blob = _deck()
    assert is_odp(blob)
    assert not is_odp(b"application/vnd.oasis.opendocument.presentation no zip")
    assert not is_odp(None)
    assert not is_odp("a string, not bytes")
    from toyocr_spark.extractor.ods import is_ods
    from toyocr_spark.extractor.odt import is_odt

    assert not is_odt(blob) and not is_ods(blob)


def test_odp_slides_extract_like_the_pptx_twin():
    """Same deck content through ODF and OOXML must extract identical
    text and spans — the two carriers of one format family."""
    from toyocr_spark.fixtures.genpptx import build_pptx, shape

    title = "Opening slide title for the extraction deck"
    bullets = [
        "First bullet with enough characters to be kept around",
        "Second bullet also long enough to stay in the extract",
    ]
    new = build_pptx(
        slides=[[shape([title], title=True), shape(bullets)]],
        notes=["speaker note junk never extract this"],
    )
    old = build_odp(
        slides=[{"title": title, "body": bullets, "notes": "other note junk"}]
    )
    assert extract(old).text == extract(new).text
    assert extract(old).spans == extract(new).spans


def test_odp_titles_notes_and_master_chrome():
    blob = _deck()
    assert b"speaker note junk" in blob  # the plants are actually in the file
    assert b"master chrome paragraph" in blob
    r = extract(blob)
    assert r.text == (
        "Opening slide title for the extraction deck\n"
        "First bullet with enough characters to be kept around\n"
        "Second bullet also long enough to stay in the extract\n"
        "Second slide heading for the wrap-up section\n"
        "Closing remark paragraph that is long enough to survive"
    )
    assert r.spans[0][2] == "title" and r.spans[3][2] == "title"
    assert "note junk" not in r.text and "master chrome" not in r.text


def test_odp_nested_outline_lists_descend():
    """Outline bodies nest text:list inside text:list-item — the walk
    must descend every level in document order."""
    nested = (
        "<draw:frame><draw:text-box><text:list>"
        "<text:list-item><text:p>Top level outline bullet with words</text:p>"
        "<text:list><text:list-item>"
        "<text:p>Nested sub-bullet that must also surface here</text:p>"
        "</text:list-item></text:list>"
        "</text:list-item></text:list></draw:text-box></draw:frame>"
    )
    blocks = tokenize_odp(build_odp(slides=[{"frames_xml": [nested]}]))
    assert [b.text for b in blocks] == [
        "Top level outline bullet with words",
        "Nested sub-bullet that must also surface here",
    ]


def test_odp_link_paragraphs_count_link_chars():
    blocks = tokenize_odp(
        build_odp(
            slides=[
                {
                    "frames_xml": [
                        frame([("linked agenda entry", "https://elsewhere.example/a")])
                    ]
                }
            ]
        )
    )
    assert blocks[0].link_chars == len("linked agenda entry")


def test_odp_malformed_containers_quiet_skip():
    blob = _deck()
    assert tokenize_odp(blob[: len(blob) // 2]) == []
    assert tokenize_odp(b"PK\x03\x04 not actually a zip archive") == []
    rng = random.Random(1833)
    for _ in range(120):
        fuzzed = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        first = extract(payload)
        assert extract(payload) == first


def test_odp_extraction_is_deterministic_and_byte_stable():
    a, b = _deck(), _deck()
    assert a == b
    assert extract(a) == extract(b)


def test_odp_through_spark_pipeline(spark):
    from toyocr_spark.pipeline import extract_pages

    blob = _deck()
    want = extract(blob).text
    assert want
    rows = [(f"https://x{i}.example/deck.odp", bytearray(blob)) for i in range(12)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r.url: r.extracted_text
        for r in extract_pages(pages.repartition(5)).collect()
    }
    assert len(got) == 12
    assert all(v == want for v in got.values())

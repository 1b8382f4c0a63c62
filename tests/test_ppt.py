"""Legacy binary PowerPoint (.ppt) extraction: CFB walk, record-tree
parse, slide/notes/master collection routing, both text-atom
encodings, and the shared-kernel dispatch — the same contract battery
every other format carries (reference analogue: the byte -> array
decode seam at /root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.ppt import is_ppt, tokenize_ppt
from toyocr_spark.fixtures.genppt import build_ppt

_SLIDES = [
    {
        "title": "Quarterly review deck heading",
        "body": [
            "First bullet paragraph long enough to clear the scoring bar here.",
            "Second bullet paragraph also long enough to be kept around.",
        ],
    },
    {
        "title": "Closing slide heading words",
        "body": ["Final body paragraph with plenty of characters to be kept."],
    },
]


def test_is_ppt_gates_on_cfb_magic_and_ppt_stream():
    blob = build_ppt(_SLIDES)
    assert is_ppt(blob)
    assert not is_ppt(b"PowerPoint Document without the container magic")
    assert not is_ppt(None)
    assert not is_ppt("a string, not bytes")
    # siblings in the CFB family do not cross-gate
    from toyocr_spark.extractor.doc import is_doc
    from toyocr_spark.extractor.xls import is_xls
    from toyocr_spark.fixtures.gendoc import build_doc

    assert not is_ppt(build_doc(["a word document paragraph long enough here"]))
    assert not is_doc(blob) and not is_xls(blob)


def test_ppt_outline_text_extracts_in_slide_order_with_titles():
    r = extract(build_ppt(_SLIDES))
    want = [
        "Quarterly review deck heading",
        "First bullet paragraph long enough to clear the scoring bar here.",
        "Second bullet paragraph also long enough to be kept around.",
        "Closing slide heading words",
        "Final body paragraph with plenty of characters to be kept.",
    ]
    assert r.text == "\n".join(want)
    assert r.spans[0][2] == "title" and r.spans[3][2] == "title"
    assert r.spans[1][2] == "text"


def test_ppt_notes_and_master_collections_are_excluded():
    """Notes (SlideListWithText instance 2) and master (instance 1)
    text never extracts — the pptx notes-part structural twin, gated
    by the collection INSTANCE, not text type alone (the planted
    master text is body-typed)."""
    blob = build_ppt(
        _SLIDES,
        notes=["presenter notes chrome never extract from this deck"],
        master_text="master layout chrome body-typed text never extract",
    )
    r = extract(blob)
    assert "presenter" not in r.text and "master layout" not in r.text
    # the excluded text IS in the container
    assert b"presenter notes chrome" in blob


def test_ppt_both_text_atom_encodings():
    slides = [
        {"title": None, "body": ["plain ascii body paragraph long enough to be kept"]},
        {"title": None, "body": ["Unicode body – café naïve résumé, long enough to be kept."]},
    ]
    blob = build_ppt(slides)
    blocks = tokenize_ppt(blob)
    assert blocks[0].text == "plain ascii body paragraph long enough to be kept"
    assert blocks[1].text == "Unicode body – café naïve résumé, long enough to be kept."
    # the ascii atom really is the one-byte form, the unicode one UTF-16
    assert b"plain ascii body" in blob
    assert "café".encode("utf-16-le") in blob


def test_ppt_multi_paragraph_atoms_split_into_blocks():
    slides = [{"title": None, "body": [
        "Paragraph one of the same text atom, long enough to be kept.",
        "Paragraph two of the same text atom, also long enough to keep.",
    ]}]
    blocks = tokenize_ppt(build_ppt(slides))
    assert len(blocks) == 2
    assert all(b.tag_path == ("ppt", "slide", "p") for b in blocks)


def test_ppt_malformed_containers_quiet_skip():
    blob = build_ppt(_SLIDES)
    assert tokenize_ppt(blob[: len(blob) // 2]) == []
    rng = random.Random(929)
    for _ in range(120):
        fuzzed = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        first = extract(payload)
        assert extract(payload) == first


def test_ppt_extraction_is_deterministic_and_byte_stable():
    a, b = build_ppt(_SLIDES), build_ppt(_SLIDES)
    assert a == b
    assert extract(a) == extract(b)


def test_ppt_through_spark_pipeline(spark):
    from toyocr_spark.pipeline import extract_pages

    blob = build_ppt(_SLIDES, notes=["junk notes"])
    want = extract(blob).text
    assert want
    rows = [(f"https://p{i}.example/deck.ppt", bytearray(blob)) for i in range(12)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r.url: r.extracted_text
        for r in extract_pages(pages.repartition(5)).collect()
    }
    assert len(got) == 12
    assert all(v == want for v in got.values())

"""MHTML (.mht) extraction: MIME envelope walk, transfer-encoding
decode (quoted-printable / base64 / identity), charset precedence,
frameset part order, outlink mining over DECODED markup, and the
shared-kernel dispatch — the same contract battery every other format
carries (reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.mhtml import is_mhtml, mhtml_links, tokenize_mhtml
from toyocr_spark.fixtures.genmht import build_mht

_NAV = (
    '<nav><ul><li><a href="/local">home</a></li>'
    '<li><a href="https://ext.example/cited">external</a></li></ul></nav>'
)
_BODY = "Body text with café and – dash, long enough to be kept by scoring."
_PAGE = f"<html><body>{_NAV}<article><p>{_BODY}</p></article></body></html>"


def test_is_mhtml_gates_on_header_line_and_mime_markers():
    assert is_mhtml(build_mht(_PAGE))
    # HTML that merely MENTIONS the markers is markup, not an envelope
    assert not is_mhtml(
        b"<!doctype html><p>MIME-Version: 1.0 and multipart/related</p>"
    )
    assert not is_mhtml(_PAGE.encode())
    assert not is_mhtml(None)
    assert not is_mhtml("a string, not bytes")
    # a plain email (no multipart/related) is not a page archive
    assert not is_mhtml(b"From: a@b\r\nMIME-Version: 1.0\r\n\r\nhello")


def test_mhtml_every_transfer_encoding_and_charset_extracts_identically():
    """The decoded document must be byte-identical to extracting the
    live page, whatever wrapper the archiver chose — six wrappers, one
    answer."""
    want = extract(_PAGE.encode())
    assert want.text == _BODY  # nav died by link density
    for enc in ("quoted-printable", "base64", "8bit"):
        for cs in ("utf-8", "windows-1252"):
            got = extract(build_mht(_PAGE, charset=cs, encoding=enc))
            assert got == want, (enc, cs)


def test_mhtml_charset_param_wins_over_sniffing():
    """A part whose MIME charset disagrees with the bytes' default
    decode must follow the header (RFC 2557: MIME metadata wins)."""
    markup = "<html><body><p>Prix fixe menu – entrée and café crème today.</p></body></html>"
    blob = build_mht(markup, charset="windows-1252", encoding="base64")
    assert "entrée and café crème" in extract(blob).text


def test_mhtml_frameset_parts_tokenize_in_envelope_order():
    frames = [
        "<html><body><p>Frame one content long enough to be kept by the scorer.</p></body></html>",
        "<html><body><p>Frame two content also long enough to be kept here.</p></body></html>",
    ]
    r = extract(build_mht(frames))
    assert r.text == (
        "Frame one content long enough to be kept by the scorer.\n"
        "Frame two content also long enough to be kept here."
    )
    blocks = tokenize_mhtml(build_mht(frames))
    assert [b.ordinal for b in blocks] == list(range(len(blocks)))


def test_mhtml_resource_parts_are_never_read():
    """Image parts ride along base64-encoded; their bytes must not
    surface as text (with or without them, same extraction)."""
    a = extract(build_mht(_PAGE, with_image=True))
    b = extract(build_mht(_PAGE, with_image=False))
    assert a == b


def test_mhtml_links_mines_decoded_absolute_hrefs_only():
    """QP encodes '=' as =3D — raw-regexp mining over the envelope
    would return mangled or no targets; the kernel leg decodes first.
    Relative hrefs are captured-sibling navigation: dropped."""
    blob = build_mht(_PAGE, encoding="quoted-printable")
    assert mhtml_links(blob) == ["https://ext.example/cited"]
    # and under base64 the target is not even byte-visible in the blob
    b64 = build_mht(_PAGE, encoding="base64")
    assert b"ext.example" not in b64
    assert mhtml_links(b64) == ["https://ext.example/cited"]
    assert mhtml_links(b"From: x\r\n\r\nnot mime") == []


def test_mhtml_malformed_envelopes_quiet_skip():
    blob = build_mht(_PAGE)
    assert tokenize_mhtml(blob[: len(blob) // 3]) in ([], tokenize_mhtml(blob[: len(blob) // 3]))
    rng = random.Random(929)
    for _ in range(80):
        fuzzed = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            fuzzed[rng.randrange(len(fuzzed))] = rng.randrange(256)
        payload = bytes(fuzzed)
        first = extract(payload)
        assert extract(payload) == first


def test_mhtml_extraction_is_deterministic_and_byte_stable():
    a, b = build_mht(_PAGE), build_mht(_PAGE)
    assert a == b
    assert extract(a) == extract(b)


def test_mhtml_through_spark_pipeline(spark):
    from toyocr_spark.pipeline import extract_pages

    blob = build_mht(_PAGE, encoding="base64")
    rows = [(f"https://m{i}.example/saved.mht", bytearray(blob)) for i in range(12)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r.url: r.extracted_text
        for r in extract_pages(pages.repartition(5)).collect()
    }
    assert len(got) == 12
    assert all(v == _BODY for v in got.values())


def test_mhtml_outlinks_through_mine_outlinks(spark):
    """The JVM-side magic gate routes archives to the kernel leg: no
    QP-mangled edges from the raw regexp, decoded edges present."""
    from toyocr_spark.functions.linkmine import mine_outlinks

    blob = build_mht(_PAGE, encoding="quoted-printable")
    live = _PAGE.encode()
    pages = spark.createDataFrame(
        [
            ("https://a.example/saved.mht", bytearray(blob)),
            ("https://b.example/dir/live.html", bytearray(live)),
        ],
        "url string, html binary",
    )
    got = {(r.src_url, r.target) for r in mine_outlinks(pages).collect()}
    assert ("https://a.example/saved.mht", "https://ext.example/cited") in got
    assert ("https://b.example/dir/live.html", "https://ext.example/cited") in got
    assert ("https://b.example/dir/live.html", "https://b.example/local") in got
    # no mangled target ever surfaces
    assert not any("=3D" in t or t.startswith("/") for _, t in got)

"""Property-based invariants of the frozen kernel (hypothesis).

These are the machine-checkable forms of the determinism hazards in
SURVEY.md §7: pure function of the bytes, stable under re-invocation,
span arithmetic consistent with the emitted text, link mass never
exceeding text mass.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from toyocr_spark.extractor import extract
from toyocr_spark.extractor.tokenizer import tokenize

SEP = "\n"

_soup = st.text(
    alphabet=st.sampled_from(list("<>&;/ abpnXdiv=\"'7\t\n café中")),
    max_size=400,
)
_tags = st.sampled_from(
    ["<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>", "<nav>",
     "</nav>", "<br>", "<h2>", "</h2>", "<li>", "</ul>", "word ",
     "two words. ", "&amp; ", "x < y ", "z > w "]
)
_structured = st.lists(_tags, max_size=60).map("".join)


@settings(max_examples=200, deadline=None)
@given(st.one_of(_soup, _structured))
def test_deterministic_and_consistent(s: str):
    b = s.encode("utf-8")
    r1, r2 = extract(b), extract(b)
    assert (r1.text, r1.spans, r1.n_blocks, r1.n_kept) == (
        r2.text, r2.spans, r2.n_blocks, r2.n_kept,
    )
    # span arithmetic: non-overlapping, ascending, exactly tiling the text
    assert r1.n_kept == len(r1.spans)
    pos = 0
    for k, (start, end, kind) in enumerate(r1.spans):
        assert start == pos and end > start
        assert kind in ("text", "title", "list", "table", "figure")
        assert r1.text[start:end] == r1.text[start:end].strip()
        pos = end + len(SEP)
    if r1.spans:
        assert r1.spans[-1][1] == len(r1.text)
    assert r1.n_kept <= r1.n_blocks


@settings(max_examples=200, deadline=None)
@given(st.one_of(_soup, _structured))
def test_block_invariants(s: str):
    for b in tokenize(s):
        assert b.n_chars == len(b.text) > 0
        assert 0 <= b.link_chars <= b.n_chars
        assert b.n_inline >= 0
        # collapsed whitespace: never two spaces, never edge whitespace
        assert "  " not in b.text and b.text == b.text.strip()


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_total_on_arbitrary_bytes(raw: bytes):
    r = extract(raw)  # must never raise: lossy decode + total kernel
    assert isinstance(r.text, str)


# ------------------------- codec properties (round 3: PNG / ADPCM / RC4)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 12),
    ch=st.sampled_from([1, 2, 3, 4]),
    interlace=st.booleans(),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, ch, interlace, data):
    """encode_png/decode_png are exact inverses for every dimension,
    channel count, filter assignment, and interlace mode."""
    from toyocr_spark.pngcodec import decode_png, encode_png

    raster = bytes(
        data.draw(st.integers(0, 255)) for _ in range(w * h * ch)
    )
    filters = [data.draw(st.integers(0, 4)) for _ in range(h * 8)]
    out = decode_png(
        encode_png(raster, w, h, ch, row_filter=lambda y: filters[y % len(filters)],
                   interlace=interlace)
    )
    assert out == (w, h, ch, raster)


@settings(max_examples=40, deadline=None)
@given(
    n_blocks=st.integers(1, 4),
    data=st.data(),
)
def test_ima_adpcm_decode_bounded_and_deterministic(n_blocks, data):
    """Decoding arbitrary ADPCM block bytes never raises past the
    block-align check, output length is exactly determined by input
    length, and decode is a pure function."""
    from toyocr_spark.multimodal import _ima_adpcm_decode

    ba = data.draw(st.integers(5, 12))
    blob = bytes(data.draw(st.integers(0, 255)) for _ in range(n_blocks * ba))
    out1 = _ima_adpcm_decode(blob, ba)
    assert out1 == _ima_adpcm_decode(blob, ba)
    # each full block: header sample + 2 samples per data byte
    assert len(out1) == n_blocks * (1 + (ba - 4) * 2) * 2


@settings(max_examples=40, deadline=None)
@given(
    key=st.binary(min_size=1, max_size=16),
    msg=st.binary(max_size=200),
)
def test_rc4_involution_property(key, msg):
    """RC4 is its own inverse under the same key — the property the
    byte-preserving PDF decryption pre-pass relies on."""
    from toyocr_spark.extractor.pdf import _rc4

    assert _rc4(key, _rc4(key, msg)) == msg
    assert len(_rc4(key, msg)) == len(msg)

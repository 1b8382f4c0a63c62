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

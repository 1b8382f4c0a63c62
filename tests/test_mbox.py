"""Unix mbox extraction: the postmark structural gate and its traps,
the bounded archive walk with per-message eml re-entry, mboxo
escape/unescape semantics, cross-message ordinal renumbering, link
mining in archive order, fuzz determinism, dispatch precedence — the
container contract battery the tar/MHTML legs carry (reference
analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.eml import is_eml
from toyocr_spark.extractor.mbox import (
    MAX_MESSAGES,
    is_mbox,
    mbox_links,
    tokenize_mbox,
)
from toyocr_spark.fixtures.genmail import build_eml, build_mbox

_PARAS_A = ["alpha body paragraph long enough to keep in the output"]
_PARAS_B = ["beta body paragraph also long enough to keep around"]


def _archive(**kw) -> bytes:
    return build_mbox(
        [
            build_eml("first subject line", _PARAS_A, encoding="7bit"),
            build_eml(
                "second subject line",
                _PARAS_B,
                encoding="base64",
                html_alternative=True,
            ),
        ],
        **kw,
    )


# --- gate -----------------------------------------------------------------


def test_gate_accepts_mbox_and_rejects_lookalikes():
    assert is_mbox(_archive())
    # a single mail is NOT an mbox (header-shaped first line, no postmark)
    assert not is_mbox(build_eml("subject", _PARAS_A))
    # an mbox is NOT a single mail (postmark first line has no colon)
    assert not is_eml(_archive())
    # prose starting with "From " but no asctime tail / no headers
    assert not is_mbox(b"From here on the story gets strange\nmore prose\n")
    # postmark-shaped first line but no mail headers after it
    assert not is_mbox(b"From a@b.c Mon Jan  1 00:00:00 2024\nplain text\n")
    assert not is_mbox(None)
    assert not is_mbox("string input")


# --- walk semantics --------------------------------------------------------


def test_messages_concatenate_in_archive_order_with_renumbered_ordinals():
    blocks = tokenize_mbox(_archive())
    texts = [b.text for b in blocks]
    assert texts == [
        "first subject line",
        _PARAS_A[0],
        "second subject line",
        _PARAS_B[0],
    ]
    assert [b.ordinal for b in blocks] == [0, 1, 2, 3]
    kinds = [b.kind for b in blocks]
    assert kinds == ["title", "text", "title", "text"]


def test_mboxo_escape_unescapes_and_decoy_never_splits():
    r = extract(_archive(escape_plant=True))
    # the escaped ">From " line is CONTENT after unescaping, joined
    # with the decoy line into one paragraph...
    assert "From the archive this line is content" in r.text
    # ...and the mid-paragraph "From " decoy did not split the archive:
    # the plant message contributes exactly one title
    assert r.text.count("escape plant subject") == 1
    # chrome from the first two messages still dies across the walk
    assert "signature chrome" not in r.text
    assert "quoted previous message" not in r.text


def test_message_cap_bounds_the_walk():
    many = build_mbox(
        [
            build_eml(f"subject {i}", [f"body paragraph number {i} kept"])
            for i in range(MAX_MESSAGES + 16)
        ]
    )
    titles = [b for b in tokenize_mbox(many) if b.kind == "title"]
    assert len(titles) == MAX_MESSAGES


# --- links ------------------------------------------------------------------


def test_links_walk_in_archive_order_quotes_excluded():
    m1 = build_eml(
        "s1", ["see https://one.example/a for details"], quoted="https://quoted.example/x"
    )
    m2 = build_eml("s2", ["and https://two.example/b too"])
    links = mbox_links(build_mbox([m1, m2]))
    assert links == ["https://one.example/a", "https://two.example/b"]


# --- dispatch + fuzz ---------------------------------------------------------


def test_dispatch_routes_mbox_through_extract():
    r = extract(_archive())
    assert r.text.split("\n") == [
        "first subject line",
        _PARAS_A[0],
        "second subject line",
        _PARAS_B[0],
    ]
    assert r.n_kept == 4


def test_fuzz_determinism_truncation_and_bitflips():
    base = _archive(escape_plant=True)
    rng = random.Random(20240166)
    for _ in range(40):
        buf = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = rng.randrange(len(buf))
        for payload in (bytes(buf), bytes(buf[:cut])):
            a = extract(payload)
            b = extract(payload)
            assert a.text == b.text and a.n_kept == b.n_kept

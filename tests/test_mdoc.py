"""mdoc(7) BSD man-page extraction: the .Dd prologue gate and its
traps (disjoint from man(7)'s .TH gate by construction), semantic
macro rendering (Nm memory, Fl flags, Op enclosure, Dq quoting, Xr
cross-refs), .Bl/.It lists, .Bd displays, .Lk link scoring, link
mining, fuzz determinism, dispatch precedence — the same contract
battery every format carries (reference analogue: the byte -> array
decode seam at /root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.manleg import is_man
from toyocr_spark.extractor.mdocleg import is_mdoc, mdoc_links, tokenize_mdoc
from toyocr_spark.fixtures.genmdoc import build_mdoc

_PARAS = [
    "the first paragraph keeps going long enough to clear the threshold here",
    "second paragraph also long enough to clear every keep threshold easily",
]


def _doc(**kw) -> bytes:
    return build_mdoc("Manual Section Title Here", _PARAS, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_mdoc_page():
    assert is_mdoc(_doc())


def test_gate_rejects_prose_and_man7():
    assert not is_mdoc(b"plain prose with no troff requests at all\nmore prose")
    # a .Dd line alone is not enough macro evidence
    assert not is_mdoc(b".Dd January 1, 2024\nplain prose follows with no macros\n")
    # man(7) pages carry .TH, never .Dd: the two gates are disjoint
    man = b".TH GREP 1\n.SH NAME\ngrep\n.PP\nbody text here\n"
    assert not is_mdoc(man) and is_man(man)
    assert not is_man(_doc())
    # a markup page QUOTING mdoc source in <pre> stays markup
    assert not is_mdoc(
        b"<html><body><pre>\n.Dd Jan 1\n.Sh NAME\n.Nm x\n</pre></body></html>"
    )
    assert not is_mdoc(None)


# --- structure / macro rendering ------------------------------------------


def test_sections_paragraphs_extract_and_chrome_dies():
    r = extract(_doc())
    lines = r.text.split("\n")
    assert lines[0] == "Manual Section Title Here"
    assert lines[1:3] == _PARAS  # .Em on word 1 renders plain
    assert r.spans[0][2] == "title"
    assert "planted comment chrome" not in r.text  # .\" comment
    assert "PlantedOS" not in r.text  # .Os prologue
    assert "PLANTED" not in r.text  # .Dt prologue
    assert "January" not in r.text  # .Dd prologue
    assert "Home" not in r.text  # .Lk nav by link density


def test_semantic_macros_render():
    src = (
        b".Dd January 1, 2024\n.Dt X 1\n.Os\n.Sh NAME\n"
        b".Nm tool\n.Nd does a planted thing\n.Sh DESCRIPTION\nThe\n.Nm\n"
        b"utility takes\n.Op Fl v\nand prints\n.Dq quoted words\nwith\n"
        b".Xr other 5\ncross references kept long enough here.\n"
    )
    blocks = tokenize_mdoc(src)
    texts = [b.text for b in blocks if b.kind == "text"]
    assert "tool - does a planted thing" in texts
    body = next(t for t in texts if "utility" in t)
    assert "The tool utility takes [-v] and prints" in body
    assert '"quoted words"' in body
    assert "other(5)" in body


def test_lists_and_display_blocks():
    r = extract(
        _doc(
            items=[
                ("i", "ignore case distinctions in the input data here"),
                ("v", "select non-matching lines instead of matches here"),
            ],
            display=["grep -i pattern file.txt", "wc -l file.txt"],
        )
    )
    assert "-i ignore case distinctions in the input data here" in r.text
    assert "grep -i pattern file.txt wc -l file.txt" in r.text
    kinds = [s[2] for s in r.spans]
    assert "list" in kinds


def test_lk_labels_carry_link_chars():
    src = (
        b".Dd January 1, 2024\n.Dt X 1\n.Os\n.Sh T\nsee the\n"
        b".Lk https://docs.example/guide full manual\n"
        b"for the long-form documentation of everything here\n"
    )
    b = next(x for x in tokenize_mdoc(src) if x.tag_path == ("mdoc", "p"))
    assert "see the full manual for the long-form" in b.text
    assert b.link_chars == len("full manual")


# --- link mining ----------------------------------------------------------


def test_links_lk_mined_displays_excluded():
    m = _doc(
        links=[("ext guide", "https://x.example/e")],
        display=[".Lk https://code.example/never nope"],
    )
    links = mdoc_links(m)
    assert "https://x.example/e" in links
    assert "https://nav.example/" in links  # nav plant mines
    assert all("code.example" not in u for u in links)  # .Bd excluded


# --- fuzz / determinism ---------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc()
    rng = random.Random(41)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)

"""troff ms paper extraction: the .TL mandated-macro gate (pairwise
disjoint with man's .TH and mdoc's .Dd), title/section/abstract
semantics, byline/footnote/eqn chrome, display and tbl handling
through the SHARED troff helpers, fuzz determinism, dispatch
precedence — the same contract battery every format carries
(reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.manleg import is_man
from toyocr_spark.extractor.mdocleg import is_mdoc
from toyocr_spark.extractor.msleg import is_ms, tokenize_ms
from toyocr_spark.fixtures.genms import build_ms

_PARAS = [
    "the first paragraph keeps going long enough to clear the threshold here",
    "second paragraph also long enough to clear every keep threshold easily",
]


def _doc(**kw) -> bytes:
    return build_ms("A Planted Paper Title Here", _PARAS, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_paper():
    assert is_ms(_doc())


def test_gate_disjoint_from_man_and_mdoc():
    assert not is_ms(b"plain prose with no troff requests at all\nmore prose")
    # .TL alone is not enough
    assert not is_ms(b".TL\nLone Title\nplain prose follows with no macros\n")
    # the three troff gates are pairwise disjoint by mandated macro
    man = b".TH GREP 1\n.SH NAME\ngrep\n.PP\nbody text here\n"
    mdoc = b".Dd January 1, 2024\n.Dt X 1\n.Os\n.Sh NAME\n.Nm x\n"
    assert not is_ms(man) and is_man(man)
    assert not is_ms(mdoc) and is_mdoc(mdoc)
    assert not is_man(_doc()) and not is_mdoc(_doc())
    # a markup page quoting ms source stays markup
    assert not is_ms(b"<html><pre>\n.TL\nT\n.PP\nx\n.AU\ny</pre></html>")
    assert not is_ms(None)


# --- structure / chrome ---------------------------------------------------


def test_title_paragraphs_extract_and_chrome_dies():
    r = extract(_doc())
    lines = r.text.split("\n")
    assert lines[0] == "A Planted Paper Title Here"
    assert lines[1:3] == _PARAS  # \fB..\fR resolves
    assert r.spans[0][2] == "title"
    assert "Planted Author Chrome" not in r.text  # .AU byline
    assert "Planted Institute Chrome" not in r.text  # .AI byline
    assert "planted comment chrome" not in r.text  # comment
    assert "planted footnote chrome" not in r.text  # .FS...FE
    assert "planted equation chrome" not in r.text  # .EQ...EN


def test_abstract_is_content_and_sections_nest():
    r = extract(
        _doc(
            abstract=[
                "the abstract paragraph carries real prose long enough to keep",
            ],
            section="Introduction Section Heading",
        )
    )
    assert "the abstract paragraph carries real prose long enough to keep" in r.text
    assert "Introduction Section Heading" in r.text
    blocks = tokenize_ms(_doc(section="Introduction Section Heading"))
    heads = [(b.tag_path, b.text) for b in blocks if b.kind == "title"]
    assert (("ms", "h1"), "A Planted Paper Title Here") in heads
    assert (("ms", "h2"), "Introduction Section Heading") in heads


def test_items_display_and_tbl():
    r = extract(
        _doc(
            items=[("alpha", "tagged item body long enough to keep around here")],
            display=["x = y + z computation kept as one block"],
            table_rows=[
                ["alpha cell text", "beta cell text"],
                ["gamma cell text", "delta cell text"],
            ],
        )
    )
    assert "alpha tagged item body long enough to keep around here" in r.text
    assert "x = y + z computation kept as one block" in r.text
    assert "alpha cell text beta cell text" in r.text  # tbl row cells join
    assert "center box" not in r.text  # tbl options line
    assert "l l." not in r.text  # tbl format line
    kinds = [s[2] for s in r.spans]
    assert "list" in kinds and "table" in kinds


# --- fuzz / determinism ---------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc()
    rng = random.Random(61)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)

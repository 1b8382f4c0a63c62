"""Texinfo extraction: the '\\input texinfo' bootstrap gate and its
traps, settitle-is-content vs header machinery, chapter depth /
itemize / multitable / example semantics, the chrome battery
(@copying, @titlepage, @menu navigation, @node pointers, comments,
index entries), @uref scoring, brace-command resolution, link
mining, fuzz determinism, dispatch precedence — the same contract
battery every format carries (reference analogue: the byte -> array
decode seam at /root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.latexleg import is_latex
from toyocr_spark.extractor.markdown import is_markdown
from toyocr_spark.extractor.texinfoleg import (
    is_texinfo,
    texinfo_links,
    tokenize_texinfo,
)
from toyocr_spark.fixtures.gentexinfo import build_texinfo

_PARAS = [
    "the first paragraph keeps going long enough to clear the threshold here",
    "second paragraph keeps @code{code spans} and @emph{emphasis} resolved here",
]
_EXPECT = [
    "the first paragraph keeps going long enough to clear the threshold here",
    "second paragraph keeps code spans and emphasis resolved here",
]


def _doc(**kw) -> bytes:
    return build_texinfo("Manual Title Here", _PARAS, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_manual():
    assert is_texinfo(_doc())


def test_gate_rejects_prose_latex_and_markup():
    assert not is_texinfo(b"plain prose with no texinfo commands\nmore prose")
    # LaTeX leads with \documentclass, not \input texinfo
    tex = b"\\documentclass{article}\n\\begin{document}\nprose\n\\end{document}\n"
    assert not is_texinfo(tex)
    assert is_latex(tex)
    # the bootstrap alone is not enough @-command evidence
    assert not is_texinfo(b"\\input texinfo\nplain prose follows directly here\n")
    assert not is_texinfo(b"<html><body>\\input texinfo</body></html>")
    assert not is_texinfo(None)


def test_gate_precedence_vs_nomagic_legs():
    t = _doc()
    assert not is_latex(t) and not is_markdown(t)


# --- structure / chrome ---------------------------------------------------


def test_settitle_paragraphs_extract_and_chrome_dies():
    r = extract(_doc())
    lines = r.text.split("\n")
    assert lines[0] == "Manual Title Here"
    assert lines[1:3] == _EXPECT  # @code{} on word 1 resolves
    assert r.spans[0][2] == "title"
    assert "planted.info" not in r.text  # @setfilename
    assert "planted copying chrome" not in r.text  # @copying + @titlepage
    assert "Planted Author Chrome" not in r.text  # @author
    assert "planted comment chrome" not in r.text  # @c comment
    assert "First Node" not in r.text  # @menu navigation + @node line


def test_chapter_items_example_and_multitable():
    r = extract(
        _doc(
            chapter="Chapter Heading Content Here",
            items=[
                "first list item long enough to keep",
                "second list item long enough too",
            ],
            example=["(define (f x) (* x x))", "(f 7)"],
            table_rows=[
                ["alpha cell text", "beta cell text"],
                ["gamma cell text", "delta cell text"],
            ],
        )
    )
    assert "Chapter Heading Content Here" in r.text
    assert "first list item long enough to keep" in r.text
    assert "(define (f x) (* x x)) (f 7)" in r.text  # @example is content
    assert "alpha cell text beta cell text" in r.text  # @tab cells join
    kinds = [s[2] for s in r.spans]
    assert "list" in kinds and "table" in kinds


def test_uref_labels_carry_link_chars_and_escapes_unescape():
    src = (
        b"\\input texinfo\n@setfilename x.info\n@settitle T\n\n"
        b"see @uref{https://docs.example/guide, the full guide} and the "
        b"escaped @@ sign with @{braces@} kept long enough here\n@bye\n"
    )
    b = next(x for x in tokenize_texinfo(src) if x.tag_path == ("texi", "p"))
    assert "the full guide" in b.text
    assert b.link_chars == len("the full guide")
    assert "@ sign with {braces} kept" in b.text
    # a label-less @uref renders its url without link chars
    src = (
        b"\\input texinfo\n@setfilename x.info\n@settitle T\n\n"
        b"see @uref{https://bare.example/} rendered bare long enough here\n"
    )
    b = next(x for x in tokenize_texinfo(src) if x.tag_path == ("texi", "p"))
    assert "https://bare.example/" in b.text and b.link_chars == 0


def test_nested_brace_commands_unwind_and_xref_drops():
    src = (
        b"\\input texinfo\n@setfilename x.info\n@settitle T\n\n"
        b"kept @strong{@code{nested}} prose continues @xref{Some Node} "
        b"long enough to stay around here\n"
    )
    b = next(x for x in tokenize_texinfo(src) if x.tag_path == ("texi", "p"))
    assert b.text == "kept nested prose continues long enough to stay around here"


def test_ignore_block_drops_wholesale():
    src = (
        b"\\input texinfo\n@setfilename x.info\n@settitle T\n\n"
        b"kept paragraph long enough to stay here\n\n"
        b"@ignore\nhidden draft body line one\nhidden draft body two\n@end ignore\n\n"
        b"also kept paragraph long enough to stay\n"
    )
    texts = [b.text for b in tokenize_texinfo(src)]
    assert "kept paragraph long enough to stay here" in texts
    assert "also kept paragraph long enough to stay" in texts
    assert not any("hidden draft" in t for t in texts)


# --- link mining ----------------------------------------------------------


def test_links_urefs_mined_example_menu_and_comments_excluded():
    t = build_texinfo(
        "T",
        ["para with an external @uref{https://x.example/e, ext link} kept"],
        example=["(fetch \"https://code.example/never\")"],
    )
    links = texinfo_links(t)
    assert "https://x.example/e" in links
    assert all("code.example" not in u for u in links)  # @example excluded


# --- fuzz / determinism ---------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc()
    rng = random.Random(31)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)

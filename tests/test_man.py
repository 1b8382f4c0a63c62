"""man(7) troff extraction: the .TH near-magic gate and its traps,
section/paragraph/tagged-list/no-fill semantics, the chrome battery
(comments, .TH metadata, renderer requests), .UR/.UE hyperlink
scoring, font-escape stripping, link mining, fuzz determinism,
dispatch precedence — the same contract battery every format carries
(reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.latexleg import is_latex
from toyocr_spark.extractor.manleg import is_man, man_links, tokenize_man
from toyocr_spark.extractor.markdown import is_markdown
from toyocr_spark.extractor.rstleg import is_rst
from toyocr_spark.extractor.wikitext import is_wikitext
from toyocr_spark.fixtures.genman import build_man

_PARAS = [
    "the first paragraph keeps going long enough to clear the threshold here",
    "second paragraph also long enough to clear every keep threshold easily",
]


def _doc(**kw) -> bytes:
    return build_man("Manual Section Title Here", _PARAS, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_man_page():
    assert is_man(_doc())


def test_gate_rejects_prose_and_lookalikes():
    assert not is_man(b"plain prose with no troff requests at all\nmore prose")
    # a .TH line alone is not enough macro evidence
    assert not is_man(b".TH LONE 1\nplain prose follows here with no macros\n")
    # mdoc pages have no .TH: quiet fall-through to prose, never half-parse
    assert not is_man(b".Dd Jan 1 2024\n.Sh NAME\n.Nm thing\n.Nd does things\n")
    # a sentence ending across lines ('...end.\nTH risk') stays prose
    assert not is_man(b"prose line one ends here.\nTH is not a macro start\n")
    # a markup page QUOTING man source in <pre> stays markup
    assert not is_man(
        b"<html><body><pre>\n.TH GREP 1\n.SH NAME\n.PP\nx</pre></body></html>"
    )
    assert not is_man(None)


def test_gate_precedence_vs_nomagic_legs():
    m = _doc()
    assert not is_latex(m) and not is_markdown(m)
    assert not is_wikitext(m) and not is_rst(m)


# --- structure / chrome ---------------------------------------------------


def test_sections_paragraphs_extract_and_chrome_dies():
    r = extract(_doc())
    lines = r.text.split("\n")
    assert lines[0] == "Manual Section Title Here"
    assert lines[1:3] == _PARAS  # .B font macro on word 1 strips
    assert r.spans[0][2] == "title"
    assert "planted comment chrome" not in r.text  # .\" comment
    assert "planted source chrome" not in r.text  # .TH metadata
    assert "Planted Manual Chrome" not in r.text  # .TH metadata
    assert "PLANTED" not in r.text  # .TH name arg
    assert "Home" not in r.text  # .UR nav by link density


def test_tagged_options_and_nofill():
    r = extract(
        _doc(
            options=[
                ("-i", "ignore case distinctions in patterns and input data"),
                ("-v", "select non-matching lines instead of matching ones"),
            ],
            nofill=["grep -i pattern file.txt", "grep -v other file.txt"],
        )
    )
    assert "-i ignore case distinctions in patterns and input data" in r.text
    assert "grep -i pattern file.txt grep -v other file.txt" in r.text
    kinds = [s[2] for s in r.spans]
    assert "list" in kinds


def test_font_escapes_and_glyphs_resolve():
    src = (
        b".TH X 1\n.SH T\n.PP\n"
        b"uses \\fBbold\\fR and \\fIitalic\\fP spans \\(em with a dash "
        b"and \\-x flags kept long enough to stay here\n"
    )
    blocks = tokenize_man(src)
    b = next(x for x in blocks if x.tag_path == ("man", "p"))
    assert b.text == (
        "uses bold and italic spans — with a dash and -x flags "
        "kept long enough to stay here"
    )
    assert b.n_inline >= 4


def test_ur_link_labels_carry_link_chars():
    src = (
        b".TH X 1\n.SH T\n.PP\n"
        b"see\n.UR https://docs.example/guide\nthe full guide\n.UE\n"
        b"for the long-form documentation of everything here\n"
    )
    b = next(x for x in tokenize_man(src) if x.tag_path == ("man", "p"))
    assert "see the full guide for the long-form documentation" in b.text
    assert b.link_chars == len("the full guide")


def test_unknown_requests_drop():
    src = (
        b".TH X 1\n.de XX\nmacro definition body chrome\n..\n.SH T\n.PP\n"
        b".RS 4\nkept paragraph body long enough to stay around here\n.RE\n"
    )
    texts = [b.text for b in tokenize_man(src)]
    assert "kept paragraph body long enough to stay around here" in texts
    # .de defines a macro; its body lines are free text to this walk,
    # but the definition terminator and requests never surface
    assert not any(".." in t for t in texts)


# --- link mining ----------------------------------------------------------


def test_links_ur_only_comments_excluded():
    m = _doc(
        links=[("ext guide", "https://x.example/e")],
    )
    links = man_links(m)
    assert "https://x.example/e" in links
    assert "https://nav.example/" in links  # nav plant mines (not extraction)
    assert len([u for u in links if "nav.example" in u]) == 3


# --- fuzz / determinism ---------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc()
    rng = random.Random(19)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)

"""AsciiDoc extraction: the first-line ``= Title`` + evidence gate
and its traps, title/section/list/table/listing semantics, the
chrome battery (doc-header author/revision lines, attribute entries,
comments and comment blocks, block macros, captions, admonitions),
url[label] macro scoring, link mining, fuzz determinism, dispatch
precedence — the same contract battery every format carries
(reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.adocleg import adoc_links, is_adoc, tokenize_adoc
from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.latexleg import is_latex
from toyocr_spark.extractor.markdown import is_markdown
from toyocr_spark.extractor.rstleg import is_rst
from toyocr_spark.extractor.wikitext import is_wikitext
from toyocr_spark.fixtures.genadoc import build_adoc

_PARAS = [
    "the first paragraph keeps going long enough to clear the threshold here",
    "second paragraph keeps *bold* and _emphasis_ and `code` resolved here",
]
_EXPECT = [
    "the first paragraph keeps going long enough to clear the threshold here",
    "second paragraph keeps bold and emphasis and code resolved here",
]


def _doc(**kw) -> bytes:
    return build_adoc("Docs Page Title Here", _PARAS, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_docs_page():
    assert is_adoc(_doc())


def test_gate_rejects_prose_markdown_rst_and_markup():
    assert not is_adoc(b"plain prose with no adoc constructs at all\nmore prose")
    # markdown stays markdown ('#' ATX, not '= ')
    md = b"# Head\n\n- [a](https://x.example/)\n\n```\ncode\n```\n"
    assert not is_adoc(md)
    # an rst page never leads with '= Title'
    rst = b":Author: x\n\nTitle Line\n==========\n\n.. note:: y\n\nprose here\n"
    assert not is_adoc(rst)
    assert not is_adoc(b"<html><body>= T\n== S\n:a: b</body></html>")
    assert not is_adoc(None)
    # a '= Title' first line alone is not enough evidence
    assert not is_adoc(b"= Title Line\n\nplain prose follows here\n")


def test_gate_precedence_vs_other_nomagic_legs():
    a = _doc()
    assert not is_latex(a) and not is_markdown(a)
    assert not is_wikitext(a) and not is_rst(a)


# --- structure / chrome ---------------------------------------------------


def test_title_paragraphs_extract_and_chrome_dies():
    r = extract(_doc())
    lines = r.text.split("\n")
    assert lines[0] == "Docs Page Title Here"
    assert lines[1:3] == _EXPECT
    assert r.spans[0][2] == "title"
    assert "Planted Author Chrome" not in r.text  # doc-header author line
    assert "v1.0" not in r.text  # revision line
    assert "planted attribute chrome" not in r.text  # :description:
    assert "planted comment chrome" not in r.text  # // and //// comments
    assert "Planted caption chrome" not in r.text  # .Caption line
    assert "planted image chrome" not in r.text  # image:: macro
    assert "planted admonition chrome" not in r.text  # NOTE: + footnote:[]
    assert "Home" not in r.text  # nav macros by link density


def test_section_levels_and_lists_listing_tables():
    r = extract(
        _doc(
            items=[
                "first list item long enough to keep",
                "second list item long enough too",
            ],
            listing=["$ grep -i pattern file.txt", "$ wc -l file.txt"],
            table_rows=[
                ["alpha cell text", "beta cell text"],
                ["gamma cell text", "delta cell text"],
            ],
        )
    )
    assert "first list item long enough to keep" in r.text
    assert "$ grep -i pattern file.txt $ wc -l file.txt" in r.text
    assert "alpha cell text beta cell text" in r.text
    kinds = [s[2] for s in r.spans]
    assert "list" in kinds and "table" in kinds
    # sections tokenize at their levels
    src = (
        b"= Doc Title Line\n:a: b\n\n== Section Two\n\nbody paragraph long"
        b" enough to keep here\n\n=== Section Three\n\nmore body long"
        b" enough to keep here too\n"
    )
    heads = [
        (b.tag_path, b.text) for b in tokenize_adoc(src) if b.kind == "title"
    ]
    assert heads == [
        (("adoc", "h1"), "Doc Title Line"),
        (("adoc", "h2"), "Section Two"),
        (("adoc", "h3"), "Section Three"),
    ]


def test_url_macro_labels_are_link_chars_and_bare_urls_vanish():
    src = (
        b"= T Line\n:a: b\n\n== S\n\n"
        b"https://a.example/[alpha beta] https://b.example/[gamma delta] tail\n"
    )
    b = next(x for x in tokenize_adoc(src) if x.tag_path == ("adoc", "p"))
    assert b.link_chars == len("alpha beta") + len("gamma delta")
    assert b.text == "alpha beta gamma delta tail"
    # the empty-label form renders the bare url: label chars are zero
    src = b"= T Line\n:a: b\n\n== S\n\nsee https://c.example/x[] for details here\n"
    b = next(x for x in tokenize_adoc(src) if x.tag_path == ("adoc", "p"))
    assert b.text == "see for details here"


def test_admonition_and_attr_lines_drop():
    src = (
        b"= T Line\n:a: b\n\nkept paragraph long enough to stay here\n\n"
        b"NOTE: hidden admonition body\ncontinuation of the admonition\n\n"
        b"[source,python]\n----\nprint('kept listing content')\n----\n\n"
        b"also kept paragraph long enough to stay\n"
    )
    texts = [b.text for b in tokenize_adoc(src)]
    assert "kept paragraph long enough to stay here" in texts
    assert "also kept paragraph long enough to stay" in texts
    assert "print('kept listing content')" in texts
    assert not any("hidden admonition" in t for t in texts)
    assert not any("source,python" in t for t in texts)


# --- link mining ----------------------------------------------------------


def test_links_macros_mined_listing_and_images_excluded():
    a = build_adoc(
        "T",
        ["para with an external https://x.example/e[ext link] kept"],
        listing=["curl https://code.example/never[nope]"],
    )
    links = adoc_links(a)
    assert "https://x.example/e" in links
    assert "https://nav.example/" in links  # nav plant mines (not extraction)
    assert all("code.example" not in u for u in links)  # listing excluded
    assert all("logo.png" not in u for u in links)  # image:: is a resource


# --- fuzz / determinism ---------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc()
    rng = random.Random(23)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)

"""Org-mode extraction: the ``#+`` keyword-anchor structural gate and
its traps, TITLE-is-content vs export-keyword chrome, headline
depth/TODO/tag stripping, drawer/comment/SRC-block semantics,
[[url][desc]] hyperlink scoring, link mining, fuzz determinism,
dispatch precedence — the same contract battery every format carries
(reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.adocleg import is_adoc
from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.latexleg import is_latex
from toyocr_spark.extractor.markdown import is_markdown
from toyocr_spark.extractor.orgleg import is_org, org_links, tokenize_org
from toyocr_spark.extractor.rstleg import is_rst
from toyocr_spark.extractor.wikitext import is_wikitext
from toyocr_spark.fixtures.genorg import build_org

_PARAS = [
    "the first paragraph keeps going long enough to clear the threshold here",
    "second paragraph keeps ~code~ and =verbatim= spans resolved cleanly here",
]
_EXPECT = [
    "the first paragraph keeps going long enough to clear the threshold here",
    "second paragraph keeps code and verbatim spans resolved cleanly here",
]


def _doc(**kw) -> bytes:
    return build_org("Docs Page Title Here", _PARAS, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_org_page():
    assert is_org(_doc())


def test_gate_rejects_prose_markdown_and_markup():
    assert not is_org(b"plain prose with no org constructs at all\nmore prose")
    # an ATX-markdown README must stay markdown: '#+' is not '# '
    md = b"# Head\n\n- [a](https://x.example/)\n- [b](https://y.example/)\n\n```\ncode\n```\n"
    assert not is_org(md)
    assert is_markdown(md)
    assert not is_org(b"<html><body>#+TITLE: fake</body></html>")
    assert not is_org(None)
    # a keyword line alone is not enough evidence
    assert not is_org(b"#+TITLE: Lone Title\n\nplain prose follows here\n")


def test_gate_precedence_vs_other_nomagic_legs():
    o = _doc()
    assert not is_latex(o) and not is_markdown(o)
    assert not is_wikitext(o) and not is_rst(o) and not is_adoc(o)


# --- structure / chrome ---------------------------------------------------


def test_title_paragraphs_extract_and_chrome_dies():
    r = extract(_doc())
    lines = r.text.split("\n")
    assert lines[0] == "Docs Page Title Here"
    assert lines[1:3] == _EXPECT  # *bold* on word 1 resolves
    assert r.spans[0][2] == "title"
    assert "Planted Author Chrome" not in r.text  # #+AUTHOR export kw
    assert "toc:nil" not in r.text  # #+OPTIONS export kw
    assert "planted comment chrome" not in r.text  # comment line + block
    assert "planted drawer chrome" not in r.text  # :PROPERTIES: drawer
    assert "Home" not in r.text  # nav hyperlinks by link density


def test_headline_depth_todo_and_tags_strip():
    src = (
        b"#+TITLE: Top Title Line\n#+AUTHOR: x\n\n"
        b"intro paragraph long enough to keep around here\n\n"
        b"* TODO First Headline Text :work:urgent:\n\n"
        b"body paragraph also long enough to keep here\n\n"
        b"** Deeper Headline Text\n\nmore body long enough to keep here too\n"
    )
    heads = [
        (b.tag_path, b.text) for b in tokenize_org(src) if b.kind == "title"
    ]
    assert heads == [
        (("org", "h1"), "Top Title Line"),
        (("org", "h2"), "First Headline Text"),
        (("org", "h3"), "Deeper Headline Text"),
    ]


def test_lists_src_and_tables():
    r = extract(
        _doc(
            headline="Section Headline Content Here",
            items=[
                "first list item long enough to keep",
                "second list item long enough too",
            ],
            src=["def sample():", "    return 42"],
            table_rows=[
                ["alpha cell text", "beta cell text"],
                ["gamma cell text", "delta cell text"],
            ],
        )
    )
    assert "Section Headline Content Here" in r.text
    assert "first list item long enough to keep" in r.text
    assert "def sample(): return 42" in r.text  # SRC block is content
    assert "alpha cell text | beta cell text" not in r.text  # cells join
    assert "alpha cell text beta cell text" in r.text
    kinds = [s[2] for s in r.spans]
    assert "list" in kinds and "table" in kinds


def test_desc_links_carry_link_chars_and_bare_links_vanish():
    src = (
        b"#+TITLE: T Line\n#+AUTHOR: x\n\n"
        b"[[https://a.example/][alpha beta]] [[https://b.example/][gamma delta]] tail\n"
    )
    b = next(x for x in tokenize_org(src) if x.tag_path == ("org", "p"))
    assert b.link_chars == len("alpha beta") + len("gamma delta")
    assert b.text == "alpha beta gamma delta tail"
    src = (
        b"#+TITLE: T Line\n#+AUTHOR: x\n\n"
        b"see [[https://c.example/x]] for details kept long enough here\n"
    )
    b = next(x for x in tokenize_org(src) if x.tag_path == ("org", "p"))
    assert b.text == "see for details kept long enough here"


def test_comment_and_export_blocks_drop_wholesale():
    src = (
        b"#+TITLE: T Line\n#+AUTHOR: x\n\n"
        b"kept paragraph long enough to stay here\n\n"
        b"#+BEGIN_EXPORT html\n<div>hidden export body</div>\n#+END_EXPORT\n\n"
        b"#+BEGIN_QUOTE\nquoted prose stays as content here fine\n#+END_QUOTE\n\n"
        b"also kept paragraph long enough to stay\n"
    )
    texts = [b.text for b in tokenize_org(src)]
    assert "kept paragraph long enough to stay here" in texts
    assert "also kept paragraph long enough to stay" in texts
    assert "quoted prose stays as content here fine" in texts
    assert not any("hidden export" in t for t in texts)


# --- link mining ----------------------------------------------------------


def test_links_hyperlinks_mined_src_and_file_links_excluded():
    o = build_org(
        "T",
        [
            "para with an external [[https://x.example/e][ext link]] kept "
            "and a bare [[https://y.example/b]] one and [[file:local.org][local]]"
        ],
        src=["fetch('https://code.example/never')"],
    )
    links = org_links(o)
    assert "https://x.example/e" in links
    assert "https://y.example/b" in links
    assert "https://nav.example/" in links  # nav plant mines (not extraction)
    assert all("code.example" not in u for u in links)  # SRC excluded
    assert all("local.org" not in u for u in links)  # file: not an edge


# --- fuzz / determinism ---------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc()
    rng = random.Random(29)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)

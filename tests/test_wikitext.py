"""MediaWiki wikitext extraction: the heading+evidence structural gate
and its traps, heading/list/table semantics, multi-line template
(infobox) skip, wikilink vs external-link scoring (internal links are
prose, external labels are link chars), the chrome battery (refs,
categories, files, magic words, comments), link mining, fuzz
determinism, dispatch precedence — the same contract battery every
format carries (reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.latexleg import is_latex
from toyocr_spark.extractor.markdown import is_markdown
from toyocr_spark.extractor.wikitext import (
    is_wikitext,
    tokenize_wikitext,
    wikitext_links,
)
from toyocr_spark.fixtures.genwiki import build_wikitext

_PARAS = [
    "the lede paragraph mentions a [[Linked Topic|linked topic]] inline and stays long",
    "second paragraph with '''bold''' and ''italic'' resolved cleanly here",
]
_EXPECT = [
    "the lede paragraph mentions a linked topic inline and stays long",
    "second paragraph with bold and italic resolved cleanly here",
]


def _doc(**kw) -> bytes:
    return build_wikitext("Article Title Here", _PARAS, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_article():
    assert is_wikitext(_doc())


def test_gate_rejects_prose_markdown_and_markup():
    assert not is_wikitext(b"plain prose with no wiki constructs at all\nmore prose")
    # an ATX-markdown README must stay markdown: no == heading ==
    md = b"# Head\n\n- [a](https://x.example/)\n- [b](https://y.example/)\n\n```\ncode\n```\n"
    assert not is_wikitext(md)
    assert is_markdown(md)
    assert not is_wikitext(b"<html><body>== fake ==</body></html>")
    assert not is_wikitext(None)
    # a heading alone is not enough evidence
    assert not is_wikitext(b"== Heading ==\nplain prose follows here\n")


def test_gate_precedence_vs_latex_and_markdown():
    w = _doc()
    assert not is_latex(w) and not is_markdown(w)


# --- structure / chrome -------------------------------------------------------


def test_heading_paragraphs_extract_and_chrome_dies():
    r = extract(_doc())
    lines = r.text.split("\n")
    assert lines[0] == "Article Title Here"
    assert lines[1:3] == _EXPECT
    assert r.spans[0][2] == "title"
    assert "infobox chrome" not in r.text  # multi-line template
    assert "NOTOC" not in r.text  # magic word
    assert "Home page" not in r.text  # external nav by link density
    assert "planted citation chrome" not in r.text  # <ref>
    assert "Planted chrome category" not in r.text  # [[Category:]]
    assert "planted file chrome" not in r.text  # [[File:...]]


def test_lists_and_tables():
    r = extract(
        _doc(
            items=["first list item long enough to keep", "second list item long enough too"],
            table_rows=[["alpha cell text", "beta cell text"], ["gamma cell text", "delta cell text"]],
        )
    )
    assert "first list item long enough to keep" in r.text
    assert "alpha cell text beta cell text" in r.text
    kinds = [s[2] for s in r.spans]
    assert "list" in kinds and "table" in kinds


def test_wikilinks_are_prose_but_external_labels_are_link_chars():
    # a wikilink-dense lede must survive (internal links are content)...
    lede = (
        "[[Alpha|alpha]] [[Beta|beta]] [[Gamma|gamma]] [[Delta|delta]] "
        "[[Epsilon|epsilon]] words carry this lede over the keep threshold"
    )
    blocks = tokenize_wikitext(f"== T ==\n\n{lede}\n".encode())
    b = next(x for x in blocks if x.tag_path == ("wiki", "p"))
    assert b.link_chars == 0 and b.n_inline == 5
    # ...while an external-link line of the same shape dies
    ext = "[https://a.example/ alpha beta] [https://b.example/ gamma delta] tail"
    blocks = tokenize_wikitext(f"== T ==\n\n{ext}\n".encode())
    b = next(x for x in blocks if x.tag_path == ("wiki", "p"))
    assert b.link_chars == len("alpha beta") + len("gamma delta")


def test_bare_external_link_is_a_numbered_ref():
    blocks = tokenize_wikitext(
        b"== T ==\n\nsee the report [https://src.example/r] for details here\n"
    )
    b = next(x for x in blocks if x.tag_path == ("wiki", "p"))
    assert b.text == "see the report for details here"


def test_nested_template_unwinds():
    blocks = tokenize_wikitext(
        b"== T ==\n\nkept prose {{outer|{{inner|x}}|y}} continues long enough here\n"
    )
    b = next(x for x in blocks if x.tag_path == ("wiki", "p"))
    assert b.text == "kept prose continues long enough here"


def test_comment_spanning_lines_strips():
    blocks = tokenize_wikitext(
        b"== T ==\n\nkept before <!-- hidden\nacross lines --> kept after here\n"
    )
    b = next(x for x in blocks if x.tag_path == ("wiki", "p"))
    assert b.text == "kept before kept after here"


# --- link mining ---------------------------------------------------------------


def test_links_external_only_templates_and_refs_excluded():
    w = build_wikitext(
        "T",
        [
            "para with an external [https://x.example/e ext link] kept"
            "<ref>cited at [https://ref.example/never]</ref>",
        ],
    )
    links = wikitext_links(w)
    assert "https://x.example/e" in links
    assert all("ref.example" not in u for u in links)
    # nav plant links DO mine (mining is not extraction)
    assert "https://nav.example/" in links
    # wikilinks are navigation, not edges
    assert all("Linked" not in u for u in links)


# --- fuzz / determinism -------------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc()
    rng = random.Random(13)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)

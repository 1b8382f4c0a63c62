"""Markdown extraction: structural-evidence sniff (the no-magic-bytes
gate and its traps), block walk (headings / paragraphs / fences /
lists / tables / quotes), inline resolution (links / images / code /
emphasis / snake_case), front-matter skip, outlink mining with the
fenced-code exclusion, fuzz determinism, and the shared-kernel
dispatch — the same contract battery every other format carries
(reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.markdown import (
    is_markdown,
    markdown_links,
    tokenize_markdown,
)
from toyocr_spark.fixtures.genmd import build_md

_PARA = (
    "Body paragraph long enough to be kept by the shared scoring rules"
    " with several plain words."
)


def _doc() -> bytes:
    return build_md("Document heading long enough", [_PARA], host="nav.example")


# --- gate -----------------------------------------------------------------


def test_gate_accepts_readme_shaped_documents():
    assert is_markdown(_doc())


def test_gate_rejects_prose_with_a_single_hash_line():
    """One '#'-prefixed line in otherwise plain prose is NOT evidence
    enough — the forgeable-surface discipline (core.py _unzlib)."""
    assert not is_markdown(
        b"# shopping\njust a plain note with no other structure at all,\n"
        b"written like ordinary prose across a couple of lines."
    )


def test_gate_rejects_tagged_pages_even_with_markdown_inside():
    """A tag-first page always belongs to the HTML leg, even when it
    EMBEDS a markdown sample (a blog post about markdown)."""
    inner = _doc().decode()
    page = f"<html><body><pre>{inner}</pre></body></html>".encode()
    assert not is_markdown(page)
    assert extract(page).text  # HTML leg handled it


def test_gate_rejects_binary_and_non_utf8():
    assert not is_markdown(b"# x\x00\n- a\n- b\n[l](https://e/)")
    assert not is_markdown(b"# \xff\xfe broken\n- a\n- b\n[l](https://e/)")
    assert not is_markdown(None)
    assert not is_markdown("a str, not bytes")


def test_gate_requires_a_heading():
    assert not is_markdown(
        b"- a list item alone\n- another item\n[link](https://e.example/)"
    )


# --- structure -------------------------------------------------------------


def test_front_matter_never_extracts():
    blob = build_md(
        "Document heading long enough",
        [_PARA],
        front_matter="title: planted secret that must not extract",
    )
    r = extract(blob)
    assert "planted secret" not in r.text
    assert r.text == "Document heading long enough\n" + _PARA


def test_nav_line_dies_by_link_density():
    r = extract(_doc())
    assert "Home" not in r.text
    assert r.n_kept == 2
    assert r.spans[0][2] == "title"


def test_block_kinds_and_paths():
    md = (
        "# Title heading number one\n\n"
        "A paragraph with enough characters to be kept around here.\n\n"
        "Setext second-level heading\n---\n\n"
        "- list item with enough characters to stand alone as a block\n\n"
        "| alpha cell text | beta cell text |\n|---|---|\n"
        "| gamma cell text | delta cell text |\n\n"
        "```\ncode body retained verbatim enough chars\n```\n"
    ).encode()
    kinds = [(b.kind, b.tag_path) for b in tokenize_markdown(md)]
    assert kinds == [
        ("title", ("md", "h1")),
        ("text", ("md", "p")),
        ("title", ("md", "h2")),
        ("list", ("md", "li")),
        ("table", ("md", "tr")),
        ("table", ("md", "tr")),
        ("text", ("md", "pre")),
    ]


def test_setext_equals_is_h1_and_trailing_atx_hashes_strip():
    blocks = tokenize_markdown(b"Top heading text\n====\n\n## Closed atx ##\n")
    assert [(b.text, b.tag_path) for b in blocks] == [
        ("Top heading text", ("md", "h1")),
        ("Closed atx", ("md", "h2")),
    ]


def test_inline_resolution_and_signals():
    md = (
        "# H\n\nSee [the docs](https://e.example/d) and ![alt text](https://i/x.png)"
        " plus `span` and **bold** and snake_case_name and <https://auto.example/>.\n"
    ).encode()
    b = [x for x in tokenize_markdown(md) if x.tag_path == ("md", "p")][0]
    assert (
        b.text
        == "See the docs and alt text plus span and bold and snake_case_name"
        " and https://auto.example/."
    )
    # link chars: 'the docs' (8) + autolink url (20); image alt is NOT link text
    assert b.link_chars == 8 + len("https://auto.example/")
    assert b.n_inline == 5  # link, image, code span, bold, autolink


def test_blockquote_joins_paragraph_and_thematic_break_splits():
    md = b"# H\n\n> quoted line one here\n> quoted line two here\n\n***\n\nafter break paragraph text\n"
    texts = [b.text for b in tokenize_markdown(md) if b.tag_path == ("md", "p")]
    assert texts == [
        "quoted line one here quoted line two here",
        "after break paragraph text",
    ]


def test_list_lazy_continuation_indented_lines_join_item():
    md = b"# H\n\n- first item line\n    continued under the item\n- second item\n"
    items = [b.text for b in tokenize_markdown(md) if b.kind == "list"]
    assert items == ["first item line continued under the item", "second item"]


def test_unclosed_fence_consumes_to_eof_without_error():
    md = b"# H\n\n```\ncode that never closes\nmore code\n"
    blocks = tokenize_markdown(md)
    assert blocks[-1].tag_path == ("md", "pre")
    assert blocks[-1].text == "code that never closes more code"


# --- outlink mining ---------------------------------------------------------


def test_markdown_links_absolute_only_and_fence_excluded():
    blob = build_md(
        "Document heading long enough",
        [_PARA + " see [ref](https://cited.example/p) and [rel](./local.md)"],
        code='fetch("https://code.example/api")',
    )
    links = markdown_links(blob)
    assert "https://cited.example/p" in links
    assert all("code.example" not in u for u in links)
    assert all("://" in u for u in links)
    # nav links are still EDGES (mining is pre-scoring, like html)
    assert sum("nav.example" in u for u in links) == 3


def test_markdown_links_mine_raw_inline_html_anchors():
    """Raw inline HTML is spec-legal markdown and ubiquitous in
    READMEs: its absolute <a href> anchors are edges too (the
    pre-markdown-leg regexp behavior, preserved)."""
    blob = build_md(
        "Document heading long enough",
        [_PARA + ' <a href="https://raw.example/page">raw anchor</a>'
         ' <a href="./local.html">rel</a>'],
    )
    links = markdown_links(blob)
    assert "https://raw.example/page" in links
    assert all("local.html" not in u for u in links)


# --- fuzz / determinism ------------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = build_md(
        "Document heading long enough",
        [_PARA],
        items=["item one long enough to keep", "item two long enough to keep"],
        table_rows=[["left cell text", "right cell text"]],
        code="print(1)",
    )
    rng = random.Random(42)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        a = extract(cut)
        b = extract(cut)
        assert a == b  # same bytes -> same result, never an exception


# --- dispatch ----------------------------------------------------------------


def test_dispatch_md_through_shared_kernel_end_to_end():
    blob = build_md(
        "Operations memo heading",
        [_PARA],
        front_matter="title: decoy",
    )
    r = extract(blob)
    assert r.text == "Operations memo heading\n" + _PARA
    assert r.spans == ((0, 23, "title"), (24, 24 + len(_PARA), "text"))

"""reStructuredText extraction: the underline+exclusive-evidence
structural gate and its traps (setext-Markdown stays markdown, prose
stays prose, HTML stays HTML), title/levels/list/table/literal
semantics, the chrome battery (field lists, comments, directives with
bodies, footnote definitions, hyperlink targets), reference-link
scoring (named refs are prose, <url> refs carry link chars), link
mining, fuzz determinism, dispatch precedence — the same contract
battery every format carries (reference analogue: the byte -> array
decode seam at /root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.latexleg import is_latex
from toyocr_spark.extractor.markdown import is_markdown
from toyocr_spark.extractor.rstleg import is_rst, rst_links, tokenize_rst
from toyocr_spark.extractor.wikitext import is_wikitext
from toyocr_spark.fixtures.genrst import build_rst

_PARAS = [
    "the lede paragraph cites the `user guide`_ inline and stays long enough",
    "second paragraph keeps **bold** and *emphasis* and ``literal`` text here",
]
_EXPECT = [
    "the lede paragraph cites the user guide inline and stays long enough",
    "second paragraph keeps bold and emphasis and literal text here",
]


def _doc(**kw) -> bytes:
    return build_rst("Document Title Here", _PARAS, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_doc_page():
    assert is_rst(_doc())


def test_gate_rejects_prose_markdown_and_markup():
    assert not is_rst(b"plain prose with no rst constructs at all\nmore prose")
    # a setext-Markdown README (underline title + bullets, no
    # rst-exclusive marker) must stay markdown: the exclusivity clause
    md = (
        b"Head Line\n=========\n\n- [a](https://x.example/)\n"
        b"- [b](https://y.example/)\n- plain third item\n"
    )
    assert not is_rst(md)
    assert not is_rst(b"<html><body>T\n=====\n.. note:: x</body></html>")
    assert not is_rst(None)
    # an underlined title alone is not enough evidence
    assert not is_rst(b"Title Line\n==========\n\nplain prose follows here\n")


def test_gate_precedence_vs_other_nomagic_legs():
    r = _doc()
    assert not is_latex(r) and not is_markdown(r) and not is_wikitext(r)


def test_adornment_bar_is_not_a_wikitext_heading():
    # the cross-gate trap that motivated tightening wikitext's heading
    # patterns: a pure '=' bar (rst title adornment) must never count
    # as '== Heading ==' evidence, or wikitext (earlier in the chain)
    # steals every rst page whose field list doubles as its 'bullets'
    from toyocr_spark.extractor.wikitext import tokenize_wikitext

    assert not is_wikitext(_doc())
    # and a bar line inside real wikitext tokenizes to no heading block
    blocks = tokenize_wikitext(b"== Real Heading ==\n\n=============\n\nprose line long enough to keep here\n")
    assert [b.text for b in blocks if b.kind == "title"] == ["Real Heading"]


# --- structure / chrome ---------------------------------------------------


def test_title_paragraphs_extract_and_chrome_dies():
    r = extract(_doc())
    lines = r.text.split("\n")
    assert lines[0] == "Document Title Here"
    assert lines[1:3] == _EXPECT
    assert r.spans[0][2] == "title"
    assert "Planted Author Chrome" not in r.text  # field list
    assert "planted comment chrome" not in r.text  # .. comment
    assert "planted image chrome" not in r.text  # directive + options
    assert "Home" not in r.text  # nav refs by link density
    assert "planted footnote chrome" not in r.text  # .. [1] definition
    assert "glossary" not in r.text.split("\n")[0]  # .. _target: chrome


def test_section_levels_by_adornment_order():
    src = (
        b"Top Title Line\n==============\n\nintro paragraph long enough to keep"
        b" around here\n\nSection Line\n------------\n\nbody paragraph also"
        b" long enough to keep here\n\n.. note:: chrome\n\n:Field: chrome\n"
    )
    blocks = tokenize_rst(src)
    heads = [(b.tag_path, b.text) for b in blocks if b.kind == "title"]
    assert heads == [
        (("rst", "h1"), "Top Title Line"),
        (("rst", "h2"), "Section Line"),
    ]


def test_lists_literal_and_tables():
    r = extract(
        _doc(
            items=[
                "first list item long enough to keep",
                "second list item long enough too",
            ],
            literal=["def sample():", "    return 42"],
            table_rows=[
                ["alpha cell text", "beta cell text"],
                ["gamma cell text", "delta cell text"],
            ],
        )
    )
    assert "first list item long enough to keep" in r.text
    assert "def sample(): return 42" in r.text  # literal block is content
    assert "The sample follows:" in r.text  # '::' partial collapse
    assert "alpha cell text beta cell text" in r.text
    kinds = [s[2] for s in r.spans]
    assert "list" in kinds and "table" in kinds


def test_named_refs_are_prose_but_url_refs_are_link_chars():
    # a reference-dense docs lede must survive (named refs are content)...
    lede = (
        "`alpha`_ `beta`_ `gamma`_ `delta`_ `epsilon`_ "
        "words carry this lede over the keep threshold"
    )
    src = f"T Line\n======\n\n.. note:: x\n\n:F: x\n\n{lede}\n".encode()
    b = next(x for x in tokenize_rst(src) if x.tag_path == ("rst", "p"))
    assert b.link_chars == 0 and b.n_inline == 5
    # ...while a <url>-reference line of the same shape dies
    ext = (
        "`alpha beta <https://a.example/>`_ "
        "`gamma delta <https://b.example/>`_ tail"
    )
    src = f"T Line\n======\n\n.. note:: x\n\n:F: x\n\n{ext}\n".encode()
    b = next(x for x in tokenize_rst(src) if x.tag_path == ("rst", "p"))
    assert b.link_chars == len("alpha beta") + len("gamma delta")
    assert b.text == "alpha beta gamma delta tail"


def test_directive_body_drops_wholesale():
    src = (
        b"T Line\n======\n\nkept paragraph long enough to stay here\n\n"
        b".. warning::\n\n   hidden admonition body line one\n"
        b"   hidden admonition body line two\n\nalso kept paragraph"
        b" long enough to stay\n"
    )
    blocks = tokenize_rst(src)
    texts = [b.text for b in blocks]
    assert "kept paragraph long enough to stay here" in texts
    assert "also kept paragraph long enough to stay" in texts
    assert not any("hidden admonition" in t for t in texts)


def test_transition_is_structure_not_prose():
    src = (
        b"T Line\n======\n\nfirst kept paragraph long enough here\n\n"
        b"----\n\nsecond kept paragraph long enough here\n"
    )
    texts = [b.text for b in tokenize_rst(src)]
    assert "----" not in " ".join(texts)
    assert "first kept paragraph long enough here" in texts
    assert "second kept paragraph long enough here" in texts


# --- link mining ----------------------------------------------------------


def test_links_refs_and_targets_literal_excluded():
    r = build_rst(
        "T",
        ["para with an external `ext link <https://x.example/e>`_ kept"],
        literal=["code sample at https://code.example/never"],
    )
    links = rst_links(r)
    assert "https://x.example/e" in links
    assert "https://nav.example/" in links  # nav plant mines (not extraction)
    assert "https://nav.example/glossary" in links  # .. _name: target
    assert all("code.example" not in u for u in links)  # literal excluded


# --- fuzz / determinism ---------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc()
    rng = random.Random(17)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)

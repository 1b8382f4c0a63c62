"""LaTeX extraction: structural-evidence sniff (the no-magic-bytes
gate and its traps), block walk (preamble skip / maketitle / sections
/ items / tabular / math / verbatim / captions), inline resolution
(href / url / styles / escapes / inline math), outlink mining with
the comment+verbatim exclusion, fuzz determinism, the shared-kernel
dispatch, and the arXiv story: a .tex member inside a tar bundle
extracts and mines through the same chain — the same contract battery
every other format carries (reference analogue: the byte -> array
decode seam at /root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.latexleg import (
    is_latex,
    latex_links,
    tokenize_latex,
)
from toyocr_spark.fixtures.genlatex import build_latex

_PARA = (
    "Body paragraph long enough to be kept by the shared scoring rules"
    " with several plain words."
)


def _doc() -> bytes:
    return build_latex("Document heading long enough", [_PARA], host="nav.example")


# --- gate -----------------------------------------------------------------


def test_gate_accepts_arxiv_shaped_documents():
    assert is_latex(_doc())


def test_gate_accepts_comment_led_sources():
    """arXiv sources routinely open with % comment banners before
    \\documentclass — the first SIGNIFICANT line decides."""
    assert is_latex(b"% banner\n% second banner\n" + _doc())


def test_gate_rejects_prose_quoting_latex_midline():
    """Prose about LaTeX (mentioning \\documentclass mid-paragraph)
    is NOT a LaTeX source — the forgeable-surface discipline
    (core.py _unzlib)."""
    assert not is_latex(
        b"a note about typesetting: put \\documentclass{article} at the\n"
        b"top, then \\usepackage{amsmath} and \\begin{document} follow.\n"
    )


def test_gate_rejects_markdown_readme_about_latex():
    """A README whose first line is an ATX heading stays markdown even
    when its fenced sample IS a LaTeX document."""
    inner = _doc().decode()
    md = f"# latex tips\n\n- a list item\n\n```\n{inner}\n```\n".encode()
    assert not is_latex(md)
    r = extract(md)
    assert r.text.startswith("latex tips")  # markdown leg handled it


def test_gate_rejects_tagged_pages_even_with_latex_inside():
    inner = _doc().decode()
    page = f"<html><body><pre>{inner}</pre></body></html>".encode()
    assert not is_latex(page)
    assert extract(page).text  # HTML leg handled it


def test_gate_rejects_binary_and_non_utf8():
    assert not is_latex(b"\\documentclass{article}\x00\\begin{document}x\\end{document}")
    assert not is_latex(b"\\documentclass \xff\xfe\n\\usepackage{x}\n\\begin{document}")
    assert not is_latex(None)
    assert not is_latex("a str, not bytes")


def test_gate_requires_structural_evidence_beyond_first_line():
    """A single \\documentclass line with nothing else is not enough."""
    assert not is_latex(b"\\documentclass{article}\njust prose after it.\n")


# --- structure -------------------------------------------------------------


def test_preamble_metadata_never_extracts():
    blob = build_latex(
        "Document heading long enough",
        [_PARA],
        author="Planted Author Secret",
        comment="planted comment secret that must not extract",
    )
    r = extract(blob)
    assert "Secret" not in r.text and "secret" not in r.text
    assert r.text == "Document heading long enough\n" + _PARA


def test_nav_line_dies_by_link_density():
    r = extract(_doc())
    assert "Home" not in r.text
    assert r.n_kept == 2
    assert r.spans[0][2] == "title"


def test_block_kinds_and_paths():
    tex = (
        "\\documentclass{article}\n"
        "\\title{Top title heading words}\n"
        "\\begin{document}\n"
        "\\maketitle\n\n"
        "\\section{First section heading}\n"
        "A paragraph with enough characters to be kept around here.\n\n"
        "\\subsection{Nested subsection heading}\n"
        "\\begin{itemize}\n"
        "\\item list item with enough characters to stand alone\n"
        "\\end{itemize}\n"
        "\\begin{tabular}{ll}\n"
        "alpha cell text & beta cell text \\\\\n"
        "gamma cell text & delta cell text \\\\\n"
        "\\end{tabular}\n"
        "\\begin{equation}\nE = m c^2\n\\end{equation}\n"
        "\\begin{verbatim}\ncode body retained verbatim enough chars\n\\end{verbatim}\n"
        "\\begin{figure}\n\\includegraphics{x.pdf}\n"
        "\\caption{A figure caption with words}\n\\end{figure}\n"
        "\\end{document}\n"
    ).encode()
    kinds = [(b.kind, b.tag_path) for b in tokenize_latex(tex)]
    assert kinds == [
        ("title", ("tex", "h1")),
        ("title", ("tex", "h2")),
        ("text", ("tex", "p")),
        ("title", ("tex", "h3")),
        ("list", ("tex", "li")),
        ("table", ("tex", "tr")),
        ("table", ("tex", "tr")),
        ("text", ("tex", "eq")),
        ("text", ("tex", "pre")),
        ("figure", ("tex", "figcaption")),
    ]


def test_maketitle_renders_the_preamble_title_once():
    tex = (
        "\\documentclass{article}\n\\title{The planted title words}\n"
        "\\begin{document}\nbody text before any title rendering here\n\n"
        "\\maketitle\n\\end{document}\n"
    ).encode()
    blocks = tokenize_latex(tex)
    assert [b.text for b in blocks if b.kind == "title"] == ["The planted title words"]
    # no \maketitle -> the title stays metadata
    tex2 = tex.replace(b"\\maketitle\n", b"")
    assert [b.text for b in tokenize_latex(tex2) if b.kind == "title"] == []


def test_inline_resolution_and_signals():
    tex = (
        "\\documentclass{article}\n\\usepackage{hyperref}\n"
        "\\begin{document}\n"
        "See \\href{https://e.example/d}{the docs} and \\url{https://auto.example/}"
        " plus \\textbf{bold} and \\emph{em} with $x^2$ and \\cite{k} refs,"
        " 5\\% done \\& fine.\n"
        "\\end{document}\n"
    ).encode()
    b = [x for x in tokenize_latex(tex) if x.tag_path == ("tex", "p")][0]
    assert (
        b.text
        == "See the docs and https://auto.example/ plus bold and em with x^2"
        " and refs, 5% done & fine."
    )
    # link chars: 'the docs' (8) + url (20); style cmds are weight only
    assert b.link_chars == 8 + len("https://auto.example/")
    assert b.n_inline == 5  # href, url, bold, em, math (cite not counted)


def test_escaped_dollar_does_not_open_inline_math():
    tex = (
        "\\documentclass{article}\n\\usepackage{x}\n\\begin{document}\n"
        "it costs \\$5 now and \\$9 later, a fair price overall today.\n"
        "\\end{document}\n"
    ).encode()
    b = tokenize_latex(tex)[0]
    assert b.text == "it costs $5 now and $9 later, a fair price overall today."


def test_comments_strip_but_verbatim_keeps_percent():
    tex = (
        "\\documentclass{article}\n\\usepackage{x}\n\\begin{document}\n"
        "kept text before % trailing comment gone\n\n"
        "\\begin{verbatim}\n100% literal percent stays here\n\\end{verbatim}\n"
        "% a full comment line vanished entirely\n"
        "\\end{document}\n"
    ).encode()
    texts = [b.text for b in tokenize_latex(tex)]
    assert texts == ["kept text before", "100% literal percent stays here"]


def test_display_math_brackets_and_item_continuation():
    tex = (
        "\\documentclass{article}\n\\usepackage{x}\n\\begin{document}\n"
        "\\[\n a + b = c \\label{eq:x}\n\\]\n"
        "\\begin{itemize}\n\\item first item line\ncontinued under the item\n"
        "\\item second item\n\\end{itemize}\n"
        "\\end{document}\n"
    ).encode()
    blocks = tokenize_latex(tex)
    assert blocks[0].tag_path == ("tex", "eq") and blocks[0].text == "a + b = c"
    items = [b.text for b in blocks if b.kind == "list"]
    assert items == ["first item line continued under the item", "second item"]


def test_unclosed_environment_consumes_to_eof_without_error():
    tex = (
        "\\documentclass{article}\n\\usepackage{x}\n\\begin{document}\n"
        "\\begin{verbatim}\ncode that never closes\nmore code\n"
    ).encode()
    blocks = tokenize_latex(tex)
    assert blocks[-1].tag_path == ("tex", "pre")
    assert blocks[-1].text == "code that never closes more code"


# --- outlink mining ---------------------------------------------------------


def test_latex_links_absolute_only_comments_and_verbatim_excluded():
    blob = build_latex(
        "Document heading long enough",
        [_PARA],
        links=[("cited page", "https://cited.example/p")],
        verbatim="see \\url{https://code.example/api} in a listing",
        comment="dead link \\url{https://commented.example/} here",
    )
    links = latex_links(blob)
    assert "https://cited.example/p" in links
    assert all("code.example" not in u for u in links)
    assert all("commented.example" not in u for u in links)
    assert all("://" in u for u in links)
    # nav links are still EDGES (mining is pre-scoring, like html/md)
    assert sum("nav.example" in u for u in links) == 3


def test_latex_links_relative_href_targets_are_not_edges():
    tex = (
        "\\documentclass{article}\n\\usepackage{hyperref}\n\\begin{document}\n"
        "\\href{sec:intro}{intro} and \\href{https://abs.example/x}{abs}\n"
        "\\end{document}\n"
    ).encode()
    assert latex_links(tex) == ["https://abs.example/x"]


# --- fuzz / determinism ------------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = build_latex(
        "Document heading long enough",
        [_PARA],
        items=["item one long enough to keep", "item two long enough to keep"],
        table_rows=[["left cell text", "right cell text"]],
        equation="E = m c^2",
        verbatim="print(1)",
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


# --- dispatch / the arXiv bundle story ---------------------------------------


def test_dispatch_tex_through_shared_kernel_end_to_end():
    blob = build_latex("Technical note heading", [_PARA])
    r = extract(blob)
    assert r.text == "Technical note heading\n" + _PARA
    assert r.spans == ((0, 22, "title"), (23, 23 + len(_PARA), "text"))


def test_arxiv_style_tex_member_inside_tar_extracts_and_mines():
    """The real-world shape: an arXiv source bundle is a tar of .tex +
    opaque figures. The member re-enters the shared dispatch, so the
    LaTeX gate fires inside the archive; tar_links routes the member
    through latex_links (comment/verbatim exclusions intact)."""
    from toyocr_spark.extractor.tarleg import tar_links
    from toyocr_spark.fixtures.gentar import build_tar

    tex = build_latex(
        "Paper title heading words",
        [_PARA],
        links=[("dataset page", "https://data.example/set")],
        comment="dead \\url{https://commented.example/} link",
    )
    png = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
    blob = build_tar([("main.tex", tex), ("fig1.png", png)])
    r = extract(blob)
    assert r.text == "Paper title heading words\n" + _PARA + " dataset page"
    links = tar_links(blob)
    assert "https://data.example/set" in links
    assert all("commented.example" not in u for u in links)

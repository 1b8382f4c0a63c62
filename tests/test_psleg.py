"""PostScript extraction: the %!PS magic gate, the show-operator
machine (moveto/scalefont/show and variants), string escape grammar
with nested parens and octal codes, the definitions-never-execute
procedure trap, XY-cut reading order over shuffled two-column shows,
multi-page banding, pdfmark link mining, fuzz determinism — the
contract battery the PDF leg carries (reference analogue: the layout
seam at /root/reference/modeling, XY-cut over positioned blocks)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.psleg import is_ps, ps_links, tokenize_ps
from toyocr_spark.fixtures.genps import build_ps, paragraph_ps


def _two_col(seed: int = 7) -> bytes:
    title = paragraph_ps(50, 740, 18, 20, ["Paper Title Banner Here"])
    c1 = [
        paragraph_ps(
            50, 700 - k * 40, 11, 13,
            [f"col one para {k} line a", f"col one para {k} line b"],
        )
        for k in range(3)
    ]
    c2 = [
        paragraph_ps(
            330, 680 - k * 40, 11, 13,
            [f"col two para {k} line a", f"col two para {k} line b"],
        )
        for k in range(3)
    ]
    body = c1 + c2
    random.Random(seed).shuffle(body)
    return build_ps([title] + body)


# --- gate -----------------------------------------------------------------


def test_gate_is_de_facto_magic():
    assert is_ps(_two_col())
    assert not is_ps(b" %!PS-Adobe-3.0\n")  # must be at byte 0
    assert not is_ps(b"the program started with %!PS they said")
    assert not is_ps(None)
    assert not is_ps("string input")


# --- machine ----------------------------------------------------------------


def test_xycut_restores_column_major_order_from_shuffled_shows():
    r = extract(_two_col())
    assert r.text.split("\n") == [
        "Paper Title Banner Here",
        "col one para 0 line a col one para 0 line b",
        "col one para 1 line a col one para 1 line b",
        "col one para 2 line a col one para 2 line b",
        "col two para 0 line a col two para 0 line b",
        "col two para 1 line a col two para 1 line b",
        "col two para 2 line a col two para 2 line b",
    ]
    assert r.n_kept == 7
    # title by font size, like the PDF leg
    assert tokenize_ps(_two_col())[0].kind == "title"


def test_dsc_comments_and_prologue_definitions_never_emit():
    r = extract(_two_col())
    assert "dsc title comment" not in r.text
    assert "fixture generator" not in r.text
    assert "prologue decoy text" not in r.text  # {...} bodies don't run


def test_string_escape_grammar():
    line = "parens \\(kept\\) and (nested) plus \\\\slash \\110i"
    # octal \110 = 'H'; the writer escapes, the reader decodes
    ops = [
        "/Helvetica findfont 11 scalefont setfont",
        f"100 700 moveto ({line}) show",
    ]
    blocks = tokenize_ps(build_ps(ops, with_prologue_trap=False))
    assert blocks[0].text == "parens (kept) and (nested) plus \\slash Hi"


def test_multipage_bands_keep_page_order():
    p2 = [paragraph_ps(50, 700, 11, 13, ["second page paragraph line one"])]
    ps = build_ps(
        [paragraph_ps(50, 700, 11, 13, ["first page paragraph line one"])],
        pages=[p2],
        with_prologue_trap=False,
    )
    r = extract(ps)
    assert r.text.split("\n") == [
        "first page paragraph line one",
        "second page paragraph line one",
    ]


def test_selectfont_also_sets_size():
    ops = [
        "/Helvetica 18 selectfont",
        "50 700 moveto (Selectfont Title Line Here) show",
    ]
    blocks = tokenize_ps(build_ps(ops, with_prologue_trap=False))
    assert blocks[0].kind == "title"


# --- links ------------------------------------------------------------------


def test_pdfmark_uri_links_mined():
    ps = build_ps(
        [paragraph_ps(50, 700, 11, 13, ["body line"])],
        uri="https://cited.example/ref",
    )
    assert ps_links(ps) == ["https://cited.example/ref"]
    assert ps_links(b"%!PS\nnothing here\n") == []


# --- fuzz ---------------------------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _two_col()
    rng = random.Random(20240171)
    for _ in range(40):
        buf = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = rng.randrange(len(buf))
        for payload in (bytes(buf), bytes(buf[:cut])):
            a = extract(payload)
            b = extract(payload)
            assert a.text == b.text and a.n_kept == b.n_kept

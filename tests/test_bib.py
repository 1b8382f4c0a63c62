"""BibTeX extraction: the @type{-entry gate and its traps,
title/abstract-are-content vs metadata-field chrome, value grammar
(brace/quote delimiters, # concatenation, protective braces), the
LaTeX-ism cleanup (accents, word macros, dashes, escapes), machinery
entries (@string/@preamble/@comment), fuzz determinism, dispatch
precedence — the same contract battery every format carries
(reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.bibleg import _delatex, is_bibtex, tokenize_bibtex
from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.texinfoleg import is_texinfo
from toyocr_spark.fixtures.genbib import build_bib

_ENTRIES = [
    (
        "A Planted Study of Crawl-Scale Extraction",
        "the first abstract paragraph keeps going long enough to clear the threshold",
    ),
    (
        "A Second Planted Title for the Database",
        "the second abstract paragraph also runs long enough to clear every threshold",
    ),
]


def _doc(**kw) -> bytes:
    return build_bib(_ENTRIES, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_database():
    assert is_bibtex(_doc())


def test_gate_rejects_prose_texinfo_and_markup():
    assert not is_bibtex(b"plain prose with no entries at all\nmore prose")
    # one entry is not enough
    assert not is_bibtex(b"@article{x,\n title = {Lone}\n}\nplain prose\n")
    # a Texinfo manual's @-commands never carry the brace+key shape
    texi = (
        b"\\input texinfo\n@setfilename x.info\n@settitle T\n\n"
        b"body prose long enough to keep here\n@bye\n"
    )
    assert not is_bibtex(texi)
    assert is_texinfo(texi)
    assert not is_bibtex(b"<html><body>@article{x, @book{y,</body></html>")
    assert not is_bibtex(None)


# --- structure / chrome ---------------------------------------------------


def test_titles_abstracts_extract_and_metadata_dies():
    r = extract(_doc(quoted_index=1, concat_index=0))
    lines = r.text.split("\n")
    assert lines[0] == _ENTRIES[0][0]  # # concatenation joined
    assert lines[1] == _ENTRIES[0][1]
    assert lines[2] == _ENTRIES[1][0]  # quoted delimiters
    assert lines[3] == _ENTRIES[1][1]
    assert r.spans[0][2] == "title"
    assert "Planted, Author Chrome" not in r.text  # author field
    assert "Planted Journal Chrome" not in r.text  # @string macro value
    assert "planted comment chrome" not in r.text  # @comment
    assert "planted preamble chrome" not in r.text  # @preamble
    assert "Planted Publisher Chrome" not in r.text  # publisher field
    assert "10.0000" not in r.text  # doi
    assert "100" not in r.text  # pages/volume/year


def test_latexisms_resolve():
    assert _delatex(r'Sch{\"o}n--M{\"u}ller {Unified} \& more~stuff \ss') == (
        "Schön–Müller Unified & more stuff ß"
    )
    assert _delatex(r"\'{e}l\`eve \c{c}a \v{s} \emph{kept}") == "élève ça š kept"
    # unknown commands drop their word, protective braces strip
    assert _delatex(r"\unknowncmd {DNA} sequencing---now") == " DNA sequencing—now"


def test_multiparagraph_abstract_splits():
    src = build_bib(
        [
            (
                "Single Entry Title Here",
                "first abstract paragraph long enough to keep here\n\n"
                "second abstract paragraph also long enough to keep",
            )
        ]
        * 2
    )
    blocks = tokenize_bibtex(src)
    texts = [b.text for b in blocks if b.kind == "text"]
    assert "first abstract paragraph long enough to keep here" in texts
    assert "second abstract paragraph also long enough to keep" in texts


def test_entry_without_abstract_keeps_title_only():
    src = build_bib([("Only A Title In This Entry", None)] * 2)
    blocks = tokenize_bibtex(src)
    assert [b.kind for b in blocks] == ["title", "title"]


# --- fuzz / determinism ---------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc()
    rng = random.Random(59)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)

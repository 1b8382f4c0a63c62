"""gettext PO catalog extraction: the msgid/msgstr-pair gate and its
traps, translated-entry rendering (continuations, escapes, plurals),
the chrome battery (header entry, all comment flavors, msgctxt,
fuzzy/untranslated/obsolete entries), the po_pairs bitext surface,
fuzz determinism — the same contract battery every format carries
(reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.markdown import is_markdown
from toyocr_spark.extractor.poleg import is_po, po_pairs, tokenize_po
from toyocr_spark.fixtures.genpo import build_po

_ENTRIES = [
    ("Source title text for the page", "Target title text for the page here"),
    (
        "the first source sentence keeps going long enough here",
        "the first target sentence keeps going long enough to clear the threshold",
    ),
    (
        "the second source sentence also runs long enough here",
        "the second target sentence also runs long enough to clear every threshold",
    ),
]


def _doc(**kw) -> bytes:
    return build_po(_ENTRIES, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_catalog():
    assert is_po(_doc())


def test_gate_rejects_prose_markdown_and_markup():
    assert not is_po(b"plain prose with no catalog keywords\nmore prose")
    # one pair is not enough
    assert not is_po(b'msgid "one"\nmsgstr "uno"\nplain prose follows here\n')
    # a markdown page QUOTING po syntax in a fence is still gated by
    # pair count — but must at least never be claimed when fenced
    md = b'# Head\n\n- item one\n- item two\n\n```\nmsgid "a"\nmsgstr "b"\n```\n'
    assert is_markdown(md)
    assert not is_po(b"<html><body>msgid msgstr</body></html>")
    assert not is_po(None)


# --- structure / chrome ---------------------------------------------------


def test_translations_extract_and_chrome_dies():
    r = extract(_doc(multiline_index=1))
    lines = r.text.split("\n")
    assert lines[0] == "Target title text for the page here"
    assert lines[1].startswith("the first target sentence")  # continuation joined
    assert lines[2].startswith("the second target sentence")
    assert "Planted Project Chrome" not in r.text  # header entry
    assert "planted comment chrome" not in r.text  # comment flavors
    assert "planted context chrome" not in r.text  # msgctxt
    assert "fuzzy target chrome" not in r.text  # #, fuzzy entry
    assert "obsolete target chrome" not in r.text  # #~ entry
    assert "source sentence" not in r.text  # msgid side never renders


def test_escapes_decode_and_plural_renders_singular():
    src = build_po(
        [("a\nb", 'quoted "x" and tab\tkept long enough to stay here')],
        plural_entry=(
            "one file",
            "%d files",
            "exactly one target file kept here",
            "many target files variant chrome",
        ),
    )
    texts = [b.text for b in tokenize_po(src)]
    assert 'quoted "x" and tab kept long enough to stay here' in texts
    assert "exactly one target file kept here" in texts
    assert not any("variant chrome" in t for t in texts)  # msgstr[1]


def test_short_ui_strings_die_by_min_chars():
    src = build_po(
        [
            ("OK", "OK"),
            ("Cancel", "Avbryt"),
            (
                "a real sentence of target prose long enough to keep here",
                "a real translated sentence of prose long enough to keep here",
            ),
        ],
        fuzzy_entry=None,
        untranslated=None,
        obsolete=None,
    )
    r = extract(src)
    assert "Avbryt" not in r.text  # MIN_CHARS curation rule
    assert "a real translated sentence" in r.text


# --- bitext surface -------------------------------------------------------


def test_po_pairs_surface():
    pairs = po_pairs(_doc())
    assert (
        "Source title text for the page",
        "Target title text for the page here",
    ) in pairs
    # fuzzy / untranslated / obsolete / header never pair
    assert all("fuzzy" not in a for a, b in pairs)
    assert all(b for _a, b in pairs)


# --- fuzz / determinism ---------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc()
    rng = random.Random(47)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)

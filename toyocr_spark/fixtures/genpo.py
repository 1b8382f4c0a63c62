"""Deterministic gettext PO fixture builder — catalog-shaped files
with the machinery a crawl-scale extractor must drop: the header
entry (Project-Id-Version/charset metadata), translator/extracted/
reference/flag comments, msgctxt disambiguators, a ``#, fuzzy`` entry
(machine-merged, unreviewed), an untranslated entry, and a ``#~``
obsolete entry. Pure string assembly, so extractor/poleg.py is tested
against an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def _q(s: str) -> str:
    return '"' + (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\t", "\\t")
    ) + '"'


def build_po(
    entries: list[tuple[str, str]],
    *,
    project: str = "Planted Project Chrome 1.0",
    fuzzy_entry: tuple[str, str] | None = ("fuzzy source chrome", "fuzzy target chrome"),
    untranslated: str | None = "untranslated source chrome",
    obsolete: tuple[str, str] | None = ("obsolete source chrome", "obsolete target chrome"),
    msgctxt: str = "planted context chrome",
    comment: str = "planted comment chrome",
    multiline_index: int | None = None,
    plural_entry: tuple[str, str, str, str] | None = None,
) -> bytes:
    """Assemble a catalog: header entry + chrome battery, then one
    entry per (msgid, msgstr) pair — the FIRST carries msgctxt and
    the full comment flavors; ``multiline_index`` splits that entry's
    msgstr across string continuations; ``plural_entry`` adds
    (msgid, msgid_plural, msgstr0, msgstr1)."""
    out: list[str] = [
        f"# {comment} translator",
        "msgid \"\"",
        "msgstr \"\"",
        f'"Project-Id-Version: {project}\\n"',
        '"Content-Type: text/plain; charset=UTF-8\\n"',
        "",
    ]
    for j, (src, dst) in enumerate(entries):
        if j == 0:
            out += [
                f"#. {comment} extracted",
                f"#: planted/file.c:{j + 10}",
                "#, c-format",
                f"msgctxt {_q(msgctxt)}",
            ]
        if j == multiline_index:
            half = len(dst) // 2
            out += [
                f"msgid {_q(src)}",
                'msgstr ""',
                f"{_q(dst[:half])}",
                f"{_q(dst[half:])}",
                "",
            ]
        else:
            out += [f"msgid {_q(src)}", f"msgstr {_q(dst)}", ""]
    if plural_entry:
        src, pl, s0, s1 = plural_entry
        out += [
            f"msgid {_q(src)}",
            f"msgid_plural {_q(pl)}",
            f"msgstr[0] {_q(s0)}",
            f"msgstr[1] {_q(s1)}",
            "",
        ]
    if fuzzy_entry:
        out += [
            "#, fuzzy",
            f"msgid {_q(fuzzy_entry[0])}",
            f"msgstr {_q(fuzzy_entry[1])}",
            "",
        ]
    if untranslated:
        out += [f"msgid {_q(untranslated)}", 'msgstr ""', ""]
    if obsolete:
        out += [
            f"#~ msgid {_q(obsolete[0])}",
            f"#~ msgstr {_q(obsolete[1])}",
            "",
        ]
    return "\n".join(out).encode("utf-8")

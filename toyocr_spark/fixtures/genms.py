"""Deterministic troff ms fixture builder — paper-shaped sources with
the structural boilerplate a crawl-scale extractor must drop: a
``.\\"`` comment, ``.AU``/``.AI`` byline metadata, an ``.FS``…``.FE``
footnote, an ``.EQ``…``.EN`` equation, and renderer requests. Pure
string assembly, so extractor/msleg.py is tested against an
independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def build_ms(
    title: str,
    paras: list[str],
    *,
    author: str = "Planted Author Chrome",
    institution: str = "Planted Institute Chrome",
    comment: str = "planted comment chrome",
    footnote: str = "planted footnote chrome",
    equation: str = "planted equation chrome",
    abstract: list[str] | None = None,
    section: str | None = None,
    items: list[tuple[str, str]] | None = None,
    display: list[str] | None = None,
    table_rows: list[list[str]] | None = None,
) -> bytes:
    """Assemble an ms paper: comment, ``.TL`` title, ``.AU``/``.AI``
    byline chrome, an optional ``.AB``…``.AE`` abstract (content),
    body paragraphs separated by ``.PP`` (the FIRST carries a
    ``\\fB…\\fR`` span and an ``.FS`` footnote plant), then optional
    ``.NH`` section / ``.IP`` items / ``.DS`` display / ``.TS``
    table content, and an ``.EQ`` equation plant."""
    out: list[str] = [
        f'.\\" {comment}',
        ".TL",
        title,
        ".AU",
        author,
        ".AI",
        institution,
    ]
    if abstract:
        out.append(".AB")
        for j, a in enumerate(abstract):
            if j:
                out.append(".PP")
            out.append(a)
        out.append(".AE")
    body = list(paras)
    for j, p in enumerate(body):
        out.append(".PP")
        if j == 0:
            words = p.split(" ", 1)
            out.append(f"\\fB{words[0]}\\fR" + (f" {words[1]}" if len(words) > 1 else ""))
            out += [".FS", f"{footnote} body", ".FE"]
        else:
            out.append(p)
    out += [".EQ", f"x sup 2 + {equation}", ".EN"]
    if section:
        out += [".NH 1", section]
    if items:
        for tag, desc in items:
            out += [f'.IP "{tag}"', desc]
    if display:
        out += [".DS", *display, ".DE"]
    if table_rows:
        out += [".TS", "center box;", "l l.", *["\t".join(r) for r in table_rows], ".TE"]
    return ("\n".join(out) + "\n").encode("utf-8")

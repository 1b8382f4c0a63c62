"""Deterministic reStructuredText fixture builder — doc-page-shaped
sources with the structural boilerplate a crawl-scale extractor must
drop: a bibliographic field list (:Author:/:Date:, metadata never
read), a ``..`` comment, an ``.. image::`` directive with options, a
link-dominated nav line of ```label <url>`_`` references (dies by the
shared density rule), a footnote definition and a hyperlink target.
Pure string assembly, so extractor/rstleg.py is tested against an
independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def nav_line(host: str) -> str:
    """A link-dominated reference line: three `label <url>`_ inline
    references joined by separators — label chars dominate, the
    scorer must drop it."""
    return (
        f"`Home <https://{host}/>`_ | `About <https://{host}/about>`_"
        f" | `Contact <https://{host}/contact>`_"
    )


def build_rst(
    title: str,
    paras: list[str],
    *,
    host: str = "nav.example",
    author: str = "Planted Author Chrome",
    comment: str = "planted comment chrome",
    footnote: str = "planted footnote chrome",
    items: list[str] | None = None,
    literal: list[str] | None = None,
    table_rows: list[list[str]] | None = None,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble an rst page: field-list metadata, a comment and an
    image directive (all chrome), a nav plant, an overline+underline
    title, body paragraphs (the FIRST carries a ``[1]_`` footnote
    reference that must strip), then optional list / literal-block /
    grid-table sections, the footnote definition and a hyperlink
    target. ``links`` embeds ```label <url>`_`` references at the end
    of the LAST paragraph (outlink-mining fixtures)."""
    bar = "=" * max(4, len(title))
    out: list[str] = [
        f":Author: {author}",
        ":Date: 2024-01-01",
        "",
        f".. {comment}",
        "",
        f".. image:: https://{host}/logo.png",
        "   :alt: planted image chrome",
        "   :width: 200px",
        "",
        # nav BEFORE the title: the link-dominated line is a hard
        # island boundary (not absorbable), so it must not sever the
        # title from the body it belongs to (the genwiki ordering)
        nav_line(host),
        "",
        bar,
        title,
        bar,
        "",
    ]
    body = list(paras)
    if body:
        body[0] = f"{body[0]} [1]_"
    if links and body:
        tail = " ".join(f"`{t} <{u}>`_" for t, u in links)
        body[-1] = f"{body[-1]} {tail}"
    for p in body:
        out += [p, ""]
    if items:
        out += [f"- {it}" for it in items]
        out.append("")
    if literal:
        out += ["The sample follows::", ""]
        out += [f"    {ln}" for ln in literal]
        out.append("")
    if table_rows:
        width = max(len(c) for r in table_rows for c in r) + 2
        border = "+" + "+".join("-" * width for _ in table_rows[0]) + "+"
        out.append(border)
        for r in table_rows:
            out.append("|" + "|".join(c.ljust(width) for c in r) + "|")
            out.append(border)
        out.append("")
    out += [f".. [1] {footnote}", ""]
    out += [f".. _glossary: https://{host}/glossary", ""]
    return "\n".join(out).encode("utf-8")

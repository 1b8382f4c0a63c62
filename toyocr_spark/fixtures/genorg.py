"""Deterministic Org-mode fixture builder — org-publish-shaped pages
with the structural boilerplate a crawl-scale extractor must drop:
export keyword metadata (#+AUTHOR/#+DATE/#+OPTIONS, never read), a
``# `` comment line, a ``#+BEGIN_COMMENT`` block, a
:PROPERTIES:…:END: drawer, and a link-dominated ``[[url][label]]``
nav line (dies by the shared density rule). Pure string assembly, so
extractor/orgleg.py is tested against an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def nav_line(host: str) -> str:
    """A link-dominated hyperlink line: three [[url][label]] links
    joined by separators — desc chars dominate, the scorer must drop
    it."""
    return (
        f"[[https://{host}/][Home]] | [[https://{host}/about][About]]"
        f" | [[https://{host}/contact][Contact]]"
    )


def build_org(
    title: str,
    paras: list[str],
    *,
    host: str = "nav.example",
    author: str = "Planted Author Chrome",
    comment: str = "planted comment chrome",
    drawer_value: str = "planted drawer chrome",
    headline: str | None = None,
    items: list[str] | None = None,
    src: list[str] | None = None,
    table_rows: list[list[str]] | None = None,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble an org page: ``#+TITLE:`` (the content keyword) with
    AUTHOR/DATE/OPTIONS export chrome, a ``# `` comment, a COMMENT
    block, a properties drawer, a nav plant, body paragraphs (the
    FIRST carries a ``*bold*`` span that must resolve), then an
    optional ``* headline`` section with list / src / table content.
    ``links`` embeds [[url][desc]] hyperlinks at the end of the LAST
    paragraph (outlink-mining fixtures)."""
    out: list[str] = [
        f"#+AUTHOR: {author}",
        "#+DATE: <2024-01-01>",
        "#+OPTIONS: toc:nil num:nil",
        f"# {comment}",
        "#+BEGIN_COMMENT",
        f"comment block body {comment}",
        "#+END_COMMENT",
        ":PROPERTIES:",
        f":CUSTOM_ID: {drawer_value}",
        ":END:",
        "",
        # nav BEFORE the title: the link-dominated line is a hard
        # island boundary (not absorbable), so it must not sever the
        # title from the body it belongs to (the genwiki ordering)
        nav_line(host),
        "",
        f"#+TITLE: {title}",
        "",
    ]
    body = list(paras)
    if body:
        words = body[0].split(" ", 1)
        body[0] = f"*{words[0]}*" + (f" {words[1]}" if len(words) > 1 else "")
    if links and body:
        tail = " ".join(f"[[{u}][{t}]]" for t, u in links)
        body[-1] = f"{body[-1]} {tail}"
    for p in body:
        out += [p, ""]
    if headline:
        out += [f"* {headline}", ""]
    if items:
        out += [f"- {it}" for it in items]
        out.append("")
    if src:
        out += ["#+BEGIN_SRC python", *src, "#+END_SRC", ""]
    if table_rows:
        out.append("|" + "+".join("---" for _ in table_rows[0]) + "|")
        for r in table_rows:
            out.append("| " + " | ".join(r) + " |")
        out.append("")
    return "\n".join(out).encode("utf-8")

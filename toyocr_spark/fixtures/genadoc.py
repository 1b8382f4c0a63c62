"""Deterministic AsciiDoc fixture builder — project-docs-shaped pages
with the structural boilerplate a crawl-scale extractor must drop:
the doc-header author/revision lines and attribute entries (metadata
never read), a ``//`` comment and a ``////`` comment block, an
``image::`` block macro with caption, a NOTE: admonition, and a
link-dominated ``url[label]`` nav line (dies by the shared density
rule). Pure string assembly, so extractor/adocleg.py is tested
against an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def nav_line(host: str) -> str:
    """A link-dominated macro line: three url[label] links joined by
    separators — label chars dominate, the scorer must drop it."""
    return (
        f"https://{host}/[Home] | https://{host}/about[About]"
        f" | https://{host}/contact[Contact]"
    )


def build_adoc(
    title: str,
    paras: list[str],
    *,
    host: str = "nav.example",
    author: str = "Planted Author Chrome",
    attribute: str = "planted attribute chrome",
    comment: str = "planted comment chrome",
    admonition: str = "planted admonition chrome",
    caption: str = "Planted caption chrome",
    items: list[str] | None = None,
    listing: list[str] | None = None,
    table_rows: list[list[str]] | None = None,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble an AsciiDoc page: ``= title`` doc header with author
    line and attribute entries (chrome), comments, an image macro
    with its ``.Caption`` line, body paragraphs (the FIRST carries a
    ``footnote:[…]`` that must strip), a NOTE: admonition plant,
    optional list / listing-block / table sections, and a trailing
    nav plant. ``links`` embeds ``url[label]`` macros at the end of
    the LAST paragraph (outlink-mining fixtures)."""
    out: list[str] = [
        f"= {title}",
        f"{author} <author@chrome.example>",
        "v1.0, 2024-01-01",
        f":description: {attribute}",
        ":toc: left",
        "",
        f"// {comment}",
        "",
        "////",
        f"comment block body {comment}",
        "////",
        "",
        f".{caption}",
        f"image::https://{host}/logo.png[planted image chrome]",
        "",
    ]
    body = list(paras)
    if body:
        body[0] = f"{body[0]}footnote:[{admonition} footnote]"
    if links and body:
        tail = " ".join(f"{u}[{t}]" for t, u in links)
        body[-1] = f"{body[-1]} {tail}"
    for p in body:
        out += [p, ""]
    out += [f"NOTE: {admonition}", ""]
    if items:
        out += [f"* {it}" for it in items]
        out.append("")
    if listing:
        out += ["----", *listing, "----", ""]
    if table_rows:
        out.append("|===")
        for r in table_rows:
            out.append("| " + " | ".join(r))
        out += ["|===", ""]
    out += [nav_line(host), ""]
    return "\n".join(out).encode("utf-8")

"""Deterministic Texinfo fixture builder — GNU-manual-shaped sources
with the structural boilerplate a crawl-scale extractor must drop:
header machinery (@setfilename/@documentencoding, never read), a
@copying block, a @titlepage block, the @menu navigation (the one
format whose nav is DECLARED structurally), @node pointer lines,
@c comments and index entries. Pure string assembly, so
extractor/texinfoleg.py is tested against an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def build_texinfo(
    title: str,
    paras: list[str],
    *,
    filename: str = "planted.info",
    copying: str = "planted copying chrome",
    comment: str = "planted comment chrome",
    menu_entries: tuple[str, ...] = ("First Node", "Second Node"),
    chapter: str | None = None,
    items: list[str] | None = None,
    example: list[str] | None = None,
    table_rows: list[list[str]] | None = None,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble a Texinfo manual: bootstrap + header machinery +
    @copying + @titlepage (chrome), the @menu nav plant and a @node
    line, @settitle carrying ``title`` (the content header command),
    body paragraphs (the FIRST carries a @code{} span that must
    resolve), then an optional @chapter section with list / example /
    multitable content. ``links`` embeds @uref{url, label} references
    at the end of the LAST paragraph (outlink-mining fixtures)."""
    out: list[str] = [
        "\\input texinfo @c -*-texinfo-*-",
        f"@setfilename {filename}",
        "@documentencoding UTF-8",
        f"@c {comment}",
        "@copying",
        f"{copying} line one",
        "@end copying",
        "@titlepage",
        f"@title {copying} title page",
        "@author Planted Author Chrome",
        "@end titlepage",
        "@menu",
        *[f"* {e}:: {e} description." for e in menu_entries],
        "@end menu",
        "@node Top, First Node, (dir), (dir)",
        f"@settitle {title}",
        "",
    ]
    body = list(paras)
    if body:
        words = body[0].split(" ", 1)
        body[0] = f"@code{{{words[0]}}}" + (f" {words[1]}" if len(words) > 1 else "")
    if links and body:
        tail = " ".join(f"@uref{{{u}, {t}}}" for t, u in links)
        body[-1] = f"{body[-1]} {tail}"
    for p in body:
        out += [p, ""]
    if chapter:
        out += [f"@chapter {chapter}", ""]
    if items:
        out += ["@itemize @bullet"]
        out += [f"@item {it}" for it in items]
        out += ["@end itemize", ""]
    if example:
        out += ["@example", *example, "@end example", ""]
    if table_rows:
        out += ["@multitable @columnfractions .5 .5"]
        out += ["@item " + " @tab ".join(r) for r in table_rows]
        out += ["@end multitable", ""]
    out += ["@bye", ""]
    return "\n".join(out).encode("utf-8")

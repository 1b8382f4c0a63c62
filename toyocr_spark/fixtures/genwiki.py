"""Deterministic MediaWiki wikitext fixture builder — article-shaped
pages with the structural boilerplate a crawl-scale extractor must
drop: a multi-line {{Infobox}} (rendered chrome, never read),
[[Category:...]] tags, __MAGICWORDS__, <ref> citations, an
external-link nav line (dies by the shared link-density rule) and a
[[File:...]] media link. Pure string assembly, so
extractor/wikitext.py is tested against an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def nav_line(host: str) -> str:
    """A link-dominated external-links line: three [url label] links
    joined by separators — label chars dominate, the scorer must
    drop it."""
    return (
        f"* [https://{host}/ Home page] | [https://{host}/about About page]"
        f" | [https://{host}/contact Contact page]"
    )


def build_wikitext(
    title: str,
    paras: list[str],
    *,
    host: str = "nav.example",
    infobox_field: str = "planted infobox chrome",
    category: str = "Planted chrome category",
    citation: str = "planted citation chrome",
    items: list[str] | None = None,
    table_rows: list[list[str]] | None = None,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble a wiki article: a multi-line infobox plant, magic
    word, a nav plant, a == title == heading, body paragraphs (the
    FIRST carries an inline <ref> citation that must strip), then
    optional list / table sections and a category tag. `links` embeds
    [url label] external links at the end of the LAST paragraph
    (outlink-mining fixtures)."""
    out: list[str] = [
        "{{Infobox planted",
        f"| name = {infobox_field}",
        "| caption = more infobox chrome",
        "}}",
        "__NOTOC__",
        "",
        # nav BEFORE the title: the link-dominated line is a hard
        # island boundary (not absorbable), so it must not sever the
        # title from the body it belongs to (the genmd ordering)
        nav_line(host),
        "",
        f"== {title} ==",
        "",
    ]
    body = list(paras)
    if body:
        body[0] = f"{body[0]}<ref>{citation}</ref>"
    if links and body:
        tail = " ".join(f"[{u} {t}]" for t, u in links)
        body[-1] = f"{body[-1]} {tail}"
    for p in body:
        out += [p, ""]
    if items:
        out += [f"* {it}" for it in items]
        out.append("")
    if table_rows:
        out.append("{| class=\"wikitable\"")
        for r in table_rows:
            out.append("|-")
            out.append("| " + " || ".join(r))
        out += ["|}", ""]
    out += [f"[[File:Planted_chrome.png|thumb|planted file chrome]]", ""]
    out += [f"[[Category:{category}]]", ""]
    return "\n".join(out).encode("utf-8")

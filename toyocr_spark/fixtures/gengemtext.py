"""Deterministic gemtext fixture builder — capsule-shaped pages with
the navigation a crawl-scale extractor must drop: header and footer
runs of short ``=> url label`` link lines (each its own line by the
format's design — dies by the shared density rule at MIN_CHARS).
Pure string assembly, so extractor/gemtextleg.py is tested against
an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def nav_links(host: str) -> list[str]:
    """Three short link lines — each a standalone block whose label
    chars dominate, so each dies by the shared rules."""
    return [
        f"=> https://{host}/ Home",
        f"=> https://{host}/about About",
        f"=> https://{host}/contact Contact",
    ]


def build_gemtext(
    title: str,
    paras: list[str],
    *,
    host: str = "nav.example",
    items: list[str] | None = None,
    pre: list[str] | None = None,
    quote: list[str] | None = None,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble a capsule page: a header nav run, the ``# title``
    heading, body paragraphs (one line each, the gemtext way), an
    optional list / preformat / quote section, a footer nav run.
    ``links`` appends annotated link lines (their labels are 100%
    anchor text, so they die by the shared density rule exactly like
    HTML anchors — outlink-mining fixtures)."""
    out: list[str] = [*nav_links(host), "", f"# {title}", ""]
    for p in paras:
        out += [p, ""]
    if items:
        out += [f"* {it}" for it in items]
        out.append("")
    if pre:
        out += ["```planted alt chrome", *pre, "```", ""]
    if quote:
        out += [f"> {q}" for q in quote]
        out.append("")
    if links:
        out += [f"=> {u} {t}" for t, u in links]
        out.append("")
    out += nav_links(host)
    return "\n".join(out).encode("utf-8")

"""Deterministic Markdown fixture builder — README-shaped documents
with the structural boilerplate a crawl-scale extractor must drop:
YAML front matter (metadata, never read), a link-dominated nav line
(dies by the shared link-density rule), optional fenced code, lists
and pipe tables. Pure string assembly, so extractor/markdown.py is
tested against an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def nav_line(host: str) -> str:
    """A link-dominated navigation line: three md links joined by
    separators — link chars dominate, the scorer must drop it."""
    return (
        f"[Home](https://{host}/) | [About](https://{host}/about)"
        f" | [Contact](https://{host}/contact)"
    )


def build_md(
    title: str,
    paras: list[str],
    *,
    host: str = "nav.example",
    front_matter: str | None = None,
    code: str | None = None,
    items: list[str] | None = None,
    table_rows: list[list[str]] | None = None,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble a markdown document: optional front matter, an ATX h1
    title, a nav plant, body paragraphs, then optional fenced code /
    list / table sections. `links` embeds [text](url) pairs inline at
    the end of the LAST paragraph (outlink-mining fixtures)."""
    out: list[str] = []
    if front_matter is not None:
        out += ["---", front_matter, "---"]
    # nav BEFORE the title: the link-dominated line is a hard island
    # boundary (not absorbable), so it must not sever the title from
    # the body it belongs to (the odt/docx fixture ordering)
    out += [nav_line(host), "", f"# {title}", ""]
    body = list(paras)
    if links and body:
        tail = " ".join(f"[{t}]({u})" for t, u in links)
        body[-1] = f"{body[-1]} {tail}"
    for p in body:
        out += [p, ""]
    if items:
        out += [f"- {it}" for it in items]
        out.append("")
    if table_rows:
        width = max(len(r) for r in table_rows)
        out.append("| " + " | ".join(f"c{i}" for i in range(width)) + " |")
        out.append("|" + "---|" * width)
        out += ["| " + " | ".join(r) + " |" for r in table_rows]
        out.append("")
    if code is not None:
        out += ["```python", code, "```", ""]
    return "\n".join(out).encode("utf-8")

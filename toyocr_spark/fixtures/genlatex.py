"""Deterministic LaTeX fixture builder — arXiv-shaped documents with
the structural boilerplate a crawl-scale extractor must drop: comment
chrome (never read), preamble metadata (``\\author``/``\\date``, the
docProps discipline), and a link-dominated ``\\href`` nav line (dies
by the shared link-density rule). Pure string assembly, so
extractor/latexleg.py is tested against an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def nav_line(host: str) -> str:
    """A link-dominated line: three \\href links joined by separators —
    link chars dominate, the scorer must drop it."""
    return (
        f"\\href{{https://{host}/}}{{Home}} | "
        f"\\href{{https://{host}/about}}{{About}} | "
        f"\\href{{https://{host}/contact}}{{Contact}}"
    )


def build_latex(
    title: str,
    paras: list[str],
    *,
    host: str = "nav.example",
    author: str = "Planted Author Decoy",
    comment: str = "planted comment chrome never extracts",
    items: list[str] | None = None,
    table_rows: list[list[str]] | None = None,
    verbatim: str | None = None,
    equation: str | None = None,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble a LaTeX document: comment + preamble (title/author/
    date metadata), a nav plant, ``\\maketitle``, body paragraphs,
    then optional itemize / tabular / equation / verbatim sections.
    `links` embeds \\href{url}{text} pairs inline at the end of the
    LAST paragraph (outlink-mining fixtures)."""
    out: list[str] = [
        f"% {comment}",
        "\\documentclass[11pt]{article}",
        "\\usepackage{hyperref}",
        f"\\title{{{title}}}",
        f"\\author{{{author}}}",
        "\\date{January 2024}",
        "\\begin{document}",
        # nav BEFORE the title: the link-dominated line is a hard
        # island boundary (not absorbable), so it must not sever the
        # title from the body it belongs to (the genmd ordering)
        nav_line(host),
        "",
        "\\maketitle",
        "",
    ]
    body = list(paras)
    if links and body:
        tail = " ".join(f"\\href{{{u}}}{{{t}}}" for t, u in links)
        body[-1] = f"{body[-1]} {tail}"
    for p in body:
        out += [p, ""]
    if items:
        out += ["\\begin{itemize}"]
        out += [f"\\item {it}" for it in items]
        out += ["\\end{itemize}", ""]
    if table_rows:
        width = max(len(r) for r in table_rows)
        out += ["\\begin{tabular}{" + "l" * width + "}", "\\toprule"]
        out += [" & ".join(r) + " \\\\" for r in table_rows]
        out += ["\\bottomrule", "\\end{tabular}", ""]
    if equation:
        out += ["\\begin{equation}", equation, "\\label{eq:planted}", "\\end{equation}", ""]
    if verbatim:
        out += ["\\begin{verbatim}", verbatim, "\\end{verbatim}", ""]
    out += ["\\end{document}", ""]
    return "\n".join(out).encode("utf-8")

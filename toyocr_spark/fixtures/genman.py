"""Deterministic man(7) troff fixture builder — manual-page-shaped
sources with the structural boilerplate a crawl-scale extractor must
drop: a ``.\\"`` comment, the ``.TH`` name/section/date/source/manual
metadata line (header+footer chrome, never read), a link-dominated
``.UR``…``.UE`` nav paragraph (dies by the shared density rule), and
renderer requests (``.ad``, ``.hy``). Pure string assembly, so
extractor/manleg.py is tested against an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def nav_paragraph(host: str) -> list[str]:
    """A link-dominated .UR/.UE run: three labels joined by
    separators — label chars dominate, the scorer must drop it."""
    out: list[str] = []
    for label, path in (("Home", ""), ("About", "about"), ("Contact", "contact")):
        out += [f".UR https://{host}/{path}", label, ".UE"]
    return out


def build_man(
    title: str,
    paras: list[str],
    *,
    name: str = "PLANTED",
    section: int = 1,
    host: str = "nav.example",
    comment: str = "planted comment chrome",
    source: str = "planted source chrome",
    manual: str = "Planted Manual Chrome",
    options: list[tuple[str, str]] | None = None,
    nofill: list[str] | None = None,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble a man page: comment + .TH metadata (chrome), a
    .UR/.UE nav plant, one .SH section heading carrying ``title``,
    then ``paras`` separated by .PP (the FIRST carries a \\fB…\\fR
    font span that must strip), optional .TP option items and an
    .nf/.fi region. ``links`` appends .UR/.UE runs whose labels join
    the LAST paragraph (outlink-mining fixtures)."""
    out: list[str] = [
        f'.\\" {comment}',
        f'.TH {name} {section} "2024-01-01" "{source}" "{manual}"',
        ".ad l",
        # nav BEFORE the heading: the link-dominated run is a hard
        # island boundary (not absorbable), so it must not sever the
        # title from the body it belongs to (the genwiki ordering)
        *nav_paragraph(host),
        ".PP",
        f".SH {title}",
    ]
    body = list(paras)
    for j, p in enumerate(body):
        if j:
            out.append(".PP")
        if j == 0:
            words = p.split(" ", 1)
            out.append(f".B {words[0]}")
            if len(words) > 1:
                out.append(words[1])
        else:
            out.append(p)
        if j == len(body) - 1 and links:
            for t, u in links:
                out += [f".UR {u}", t, ".UE"]
    if options:
        for tag, desc in options:
            out += [".TP", f".B {tag}", desc]
    if nofill:
        out += [".nf", *nofill, ".fi"]
    return ("\n".join(out) + "\n").encode("utf-8")

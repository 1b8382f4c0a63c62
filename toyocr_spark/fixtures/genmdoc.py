"""Deterministic mdoc(7) fixture builder — BSD-manual-shaped sources
with the structural boilerplate a crawl-scale extractor must drop: a
``.\\"`` comment, the ``.Dd``/``.Dt``/``.Os`` prologue (header+footer
chrome, never read), and a link-dominated ``.Lk`` nav paragraph
(dies by the shared density rule). Pure string assembly, so
extractor/mdocleg.py is tested against an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def nav_paragraph(host: str) -> list[str]:
    """A link-dominated .Lk run: three labels joined on one rendered
    paragraph — label chars dominate, the scorer must drop it."""
    return [
        f".Lk https://{host}/ Home",
        f".Lk https://{host}/about About",
        f".Lk https://{host}/contact Contact",
    ]


def build_mdoc(
    title: str,
    paras: list[str],
    *,
    name: str = "PLANTED",
    section: int = 1,
    host: str = "nav.example",
    comment: str = "planted comment chrome",
    os_name: str = "PlantedOS chrome 1.0",
    items: list[tuple[str, str]] | None = None,
    display: list[str] | None = None,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble an mdoc page: comment + .Dd/.Dt/.Os prologue
    (chrome), a .Lk nav plant, one .Sh heading carrying ``title``,
    then ``paras`` separated by .Pp (the FIRST carries an .Em span
    that must render to plain text), optional .Bl/.It option items
    and a .Bd -literal display. ``links`` appends .Lk runs whose
    labels join the LAST paragraph (outlink-mining fixtures)."""
    out: list[str] = [
        f'.\\" {comment}',
        ".Dd January 1, 2024",
        f".Dt {name} {section}",
        f".Os {os_name}",
        # nav BEFORE the heading (the genman ordering): hard island
        # boundary that must not sever the title from its body
        *nav_paragraph(host),
        ".Pp",
        f".Sh {title}",
    ]
    body = list(paras)
    for j, p in enumerate(body):
        if j:
            out.append(".Pp")
        if j == 0:
            words = p.split(" ", 1)
            out.append(f".Em {words[0]}")
            if len(words) > 1:
                out.append(words[1])
        else:
            out.append(p)
        if j == len(body) - 1 and links:
            out += [f".Lk {u} {t}" for t, u in links]
    if items:
        out.append(".Bl -tag -width Ds")
        for tag, desc in items:
            out += [f".It Fl {tag}", desc]
        out.append(".El")
    if display:
        out += [".Bd -literal", *display, ".Ed"]
    return ("\n".join(out) + "\n").encode("utf-8")

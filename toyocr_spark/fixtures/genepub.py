"""Deterministic EPUB fixture builder: a conformant OCF container
(stored `mimetype` FIRST per spec, META-INF/container.xml, an OPF
package with manifest + spine, XHTML chapter parts, optional EPUB3
nav doc) from pure stdlib.

The spine trap mirrors genpptx: chapter i is stored in the part named
chapter{n-i}.xhtml, so a reader walking part names assembles the book
backwards — only the spine idref order is correct."""

from __future__ import annotations

import io
import zipfile

_CONTAINER = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
    '<rootfiles><rootfile full-path="OEBPS/content.opf" '
    'media-type="application/oebps-package+xml"/></rootfiles></container>'
)


def chapter_html(title: str, paragraphs: list[str]) -> str:
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<html><head><title>{title}</title></head>"
        f"<body><h1>{title}</h1>{body}</body></html>"
    )


def build_epub(
    chapters: list[str],
    include_nav: bool = True,
) -> bytes:
    """chapters: XHTML documents (chapter_html helper) in READING
    order. include_nav plants an EPUB3 nav doc (a link list) in the
    spine — boilerplate the link-density rule must drop."""
    n = len(chapters)
    part_of = {i: f"OEBPS/chapter{n - i}.xhtml" for i in range(n)}
    manifest = []
    spine = []
    if include_nav:
        nav_links = "".join(
            f'<li><a href="chapter{n - i}.xhtml">ch {i + 1}</a></li>' for i in range(n)
        )
        nav = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<html xmlns:epub="http://www.idpf.org/2007/ops"><body>'
            f'<nav epub:type="toc"><ol>{nav_links}</ol></nav></body></html>'
        )
        manifest.append(
            '<item id="nav" href="nav.xhtml" media-type="application/xhtml+xml" '
            'properties="nav"/>'
        )
        spine.append('<itemref idref="nav"/>')
    for i in range(n):
        manifest.append(
            f'<item id="c{i + 1}" href="chapter{n - i}.xhtml" '
            'media-type="application/xhtml+xml"/>'
        )
        spine.append(f'<itemref idref="c{i + 1}"/>')
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="uid">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        '<dc:identifier id="uid">urn:uuid:fixture</dc:identifier>'
        "<dc:title>fixture book</dc:title><dc:language>en</dc:language></metadata>"
        f'<manifest>{"".join(manifest)}</manifest>'
        f'<spine>{"".join(spine)}</spine></package>'
    )
    parts: list[tuple[str, str]] = [
        ("META-INF/container.xml", _CONTAINER),
        ("OEBPS/content.opf", opf),
    ]
    if include_nav:
        parts.append(("OEBPS/nav.xhtml", nav))
    for i, html in enumerate(chapters):
        parts.append((part_of[i], html))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        # OCF: mimetype FIRST and stored
        zi = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        zi.create_system = 0
        zf.writestr(zi, "application/epub+zip")
        for name, content in parts:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.create_system = 0
            zf.writestr(zi, content)
    return buf.getvalue()

"""Deterministic OpenDocument Text (.odt) fixture builder — the ODF
twin of fixtures/gendocx.py: a real ODF package (STORED `mimetype`
member FIRST per the spec, META-INF/manifest.xml, content.xml,
styles.xml carrying the planted header/footer the extractor must
never read) assembled from pure stdlib, so extractor/odt.py is tested
against files any conformant ODF reader opens.

Determinism: ZIP_STORED members with the epoch date_time and no
platform extra fields — identical bytes for identical inputs on every
host (the byte-identity north rule extends to fixture generation)."""

from __future__ import annotations

import io
import zipfile

MIMETYPE = "application/vnd.oasis.opendocument.text"

_NSDECL = (
    ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
    ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
    ' xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"'
    ' xmlns:style="urn:oasis:names:tc:opendocument:xmlns:style:1.0"'
    ' xmlns:xlink="http://www.w3.org/1999/xlink"'
)

_MANIFEST = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<manifest:manifest xmlns:manifest='
    '"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">'
    f'<manifest:file-entry manifest:full-path="/" manifest:media-type="{MIMETYPE}"/>'
    '<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>'
    '<manifest:file-entry manifest:full-path="styles.xml" manifest:media-type="text/xml"/>'
    "</manifest:manifest>"
)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def paragraph(
    text: str | list[str],
    heading: int = 0,
    link: str | None = None,
) -> str:
    """One text:p (or text:h with the given outline level): text as
    direct content, or a list -> the first fragment direct and the
    rest wrapped in text:span (run fragmentation, the n_inline
    signal). link wraps ALL content in one text:a."""
    frags = [text] if isinstance(text, str) else list(text)
    inner = _esc(frags[0]) + "".join(
        f"<text:span>{_esc(f)}</text:span>" for f in frags[1:]
    )
    if link is not None:
        inner = f'<text:a xlink:type="simple" xlink:href="{_esc(link)}">{inner}</text:a>'
    if heading:
        return f'<text:h text:outline-level="{heading}">{inner}</text:h>'
    return f"<text:p>{inner}</text:p>"


def table(rows: list[list[str]]) -> str:
    trs = "".join(
        "<table:table-row>"
        + "".join(
            f"<table:table-cell>{paragraph(cell)}</table:table-cell>" for cell in row
        )
        + "</table:table-row>"
        for row in rows
    )
    return f"<table:table>{trs}</table:table>"


def note(body: str, citation: str = "1") -> str:
    """An inline footnote — content the extractor must SKIP (the
    inline twin of the never-read-styles.xml rule)."""
    return (
        '<text:note text:note-class="footnote">'
        f"<text:note-citation>{_esc(citation)}</text:note-citation>"
        f"<text:note-body><text:p>{_esc(body)}</text:p></text:note-body>"
        "</text:note>"
    )


def build_odt(
    body_xml: list[str] | None = None,
    paragraphs: list[str] | None = None,
    header_text: str | None = None,
    footer_text: str | None = None,
) -> bytes:
    """Assemble an .odt: body_xml = pre-built text:p/text:h/table
    fragments (the paragraph()/table()/note() helpers), or paragraphs
    = plain strings, one text:p each. header_text/footer_text plant a
    real master-page header/footer in styles.xml — content the
    extractor must structurally EXCLUDE by never reading the part."""
    frags = list(body_xml or [])
    for p in paragraphs or []:
        frags.append(paragraph(p))
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<office:document-content{_NSDECL}>"
        "<office:body><office:text>"
        + "".join(frags)
        + "</office:text></office:body></office:document-content>"
    )
    hdr = (
        f"<style:header><text:p>{_esc(header_text)}</text:p></style:header>"
        if header_text is not None
        else ""
    )
    ftr = (
        f"<style:footer><text:p>{_esc(footer_text)}</text:p></style:footer>"
        if footer_text is not None
        else ""
    )
    styles = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<office:document-styles{_NSDECL}>"
        "<office:master-styles>"
        f'<style:master-page style:name="Standard">{hdr}{ftr}</style:master-page>'
        "</office:master-styles></office:document-styles>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        # the spec-mandated first member: STORED, so the mimetype is
        # byte-visible at a fixed offset (what is_odt gates on)
        for name, data in (
            ("mimetype", MIMETYPE),
            ("META-INF/manifest.xml", _MANIFEST),
            ("content.xml", content),
            ("styles.xml", styles),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.create_system = 0
            zf.writestr(zi, data)
    return buf.getvalue()

"""Deterministic OOXML (.docx) fixture builder — the WordprocessingML
twin of fixtures/genpdf.py: real byte layouts (a valid OPC zip with
[Content_Types].xml, package rels and the WordprocessingML main part)
assembled from pure stdlib, so extractor/docx.py is tested against
files any conformant reader opens, not against its own parser.

Determinism: ZIP_STORED members with the epoch date_time and no
platform extra fields — identical bytes for identical inputs on every
host (the byte-identity north rule extends to fixture generation).
"""

from __future__ import annotations

import io
import zipfile

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_R_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "{overrides}</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)

_HDR_CT = (
    '<Override PartName="/word/{name}.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.{kind}+xml"/>'
)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")  # safe in text nodes, required in attributes
    )


def _run(text: str, bold: bool = False) -> str:
    rpr = "<w:rPr><w:b/></w:rPr>" if bold else ""
    return f'<w:r>{rpr}<w:t xml:space="preserve">{_esc(text)}</w:t></w:r>'


def paragraph(
    text: str | list[str],
    style: str | None = None,
    link: str | None = None,
) -> str:
    """One w:p: text as a single run, or a list -> one run each (run
    fragmentation, the n_inline signal). style plants w:pStyle
    (e.g. 'Heading1'); link wraps ALL runs in one w:hyperlink."""
    runs = "".join(_run(t, bold=bool(style)) for t in ([text] if isinstance(text, str) else text))
    if link is not None:
        runs = f'<w:hyperlink r:id="{link}">{runs}</w:hyperlink>'
    ppr = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
    return f"<w:p>{ppr}{runs}</w:p>"


def table(rows: list[list[str]]) -> str:
    """One w:tbl, each cell a single-paragraph w:tc."""
    trs = "".join(
        "<w:tr>"
        + "".join(f"<w:tc>{paragraph(cell)}</w:tc>" for cell in row)
        + "</w:tr>"
        for row in rows
    )
    return f"<w:tbl>{trs}</w:tbl>"


def build_docx(
    body_xml: list[str] | None = None,
    paragraphs: list[str] | None = None,
    header_text: str | None = None,
    footer_text: str | None = None,
    links: dict[str, str] | None = None,
    core_props: dict[str, str] | None = None,
) -> bytes:
    """Assemble a .docx: body_xml = pre-built w:p/w:tbl fragments (the
    paragraph()/table() helpers), or paragraphs = plain strings, one
    w:p each. header_text/footer_text add real header1/footer1 parts
    wired through document.xml.rels + sectPr references — content the
    extractor must structurally EXCLUDE. links maps hyperlink
    relationship ids (the paragraph(link=...) values) to External
    targets in document.xml.rels — the outlink carrier docx_links
    mines."""
    frags = list(body_xml or [])
    for p in paragraphs or []:
        frags.append(paragraph(p))
    sect = ""
    doc_rels: list[str] = [
        f'<Relationship Id="{rid}" Type="http://schemas.openxmlformats.org/'
        f'officeDocument/2006/relationships/hyperlink" Target="{_esc(target)}" '
        f'TargetMode="External"/>'
        for rid, target in (links or {}).items()
    ]
    extra_parts: list[tuple[str, str]] = []
    ct_overrides = ""
    refs = ""
    if header_text is not None:
        refs += '<w:headerReference w:type="default" r:id="rIdH"/>'
        doc_rels.append(
            '<Relationship Id="rIdH" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/header" Target="header1.xml"/>'
        )
        extra_parts.append(
            (
                "word/header1.xml",
                f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<w:hdr xmlns:w="{_W_NS}">{paragraph(header_text)}</w:hdr>',
            )
        )
        ct_overrides += _HDR_CT.format(name="header1", kind="header")
    if footer_text is not None:
        refs += '<w:footerReference w:type="default" r:id="rIdF"/>'
        doc_rels.append(
            '<Relationship Id="rIdF" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/footer" Target="footer1.xml"/>'
        )
        extra_parts.append(
            (
                "word/footer1.xml",
                f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<w:ftr xmlns:w="{_W_NS}">{paragraph(footer_text)}</w:ftr>',
            )
        )
        ct_overrides += _HDR_CT.format(name="footer1", kind="footer")
    sect = f"<w:sectPr>{refs}</w:sectPr>"
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}" xmlns:r="{_R_NS}">'
        f'<w:body>{"".join(frags)}{sect}</w:body></w:document>'
    )
    root_rels = _ROOT_RELS
    if core_props:
        from toyocr_spark.fixtures.genopc import CORE_CT_OVERRIDE, CORE_REL, core_part

        ct_overrides += CORE_CT_OVERRIDE
        root_rels = root_rels.replace("</Relationships>", CORE_REL + "</Relationships>")
        extra_parts.append(core_part(core_props))
    parts: list[tuple[str, str]] = [
        ("[Content_Types].xml", _CONTENT_TYPES.format(overrides=ct_overrides)),
        ("_rels/.rels", root_rels),
        ("word/document.xml", document),
    ]
    if doc_rels:
        parts.append(
            (
                "word/_rels/document.xml.rels",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<Relationships xmlns="http://schemas.openxmlformats.org/'
                'package/2006/relationships">' + "".join(doc_rels) + "</Relationships>",
            )
        )
    parts.extend(extra_parts)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, content in parts:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.create_system = 0  # pin: no host-OS byte in the header
            zf.writestr(zi, content)
    return buf.getvalue()

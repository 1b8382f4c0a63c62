"""Deterministic OOXML (.pptx) fixture builder — the PresentationML
sibling of gendocx/genxlsx: a valid OPC deck (content types, package
rels, presentation.xml with sldIdLst, presentation rels, slide parts,
optional notesSlide parts) from pure stdlib.

Slide ORDER is carried by sldIdLst ids, deliberately NOT by part-name
order: build_pptx names parts in reverse (slideN.xml holds the FIRST
slide) so any reader that sorts part names instead of walking the id
list extracts slides backwards — the fixture encodes the format's
one real trap. Notes parts hold content the extractor must never
surface."""

from __future__ import annotations

import io
import zipfile

_P_NS = "http://schemas.openxmlformats.org/presentationml/2006/main"
_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
_R_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>'
    "</Relationships>"
)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def shape(paragraphs: list[str], title: bool = False) -> str:
    """One p:sp with a txBody: one a:p per string; title=True plants
    the title placeholder type."""
    ph = '<p:ph type="title"/>' if title else ""
    nv = f"<p:nvSpPr><p:cNvPr id=\"1\" name=\"s\"/><p:cNvSpPr/><p:nvPr>{ph}</p:nvPr></p:nvSpPr>"
    paras = "".join(
        f'<a:p><a:r><a:t>{_esc(p)}</a:t></a:r></a:p>' for p in paragraphs
    )
    return f"<p:sp>{nv}<p:spPr/><p:txBody><a:bodyPr/>{paras}</p:txBody></p:sp>"


def build_pptx(
    slides: list[list[str]],
    notes: list[str] | None = None,
    core_props: dict[str, str] | None = None,
    links: dict[str, str] | None = None,
) -> bytes:
    """slides: one list of shape-XML fragments (the shape() helper)
    per slide, in DECK order. notes: optional per-slide speaker-notes
    text (shorter than slides is fine) — content the extractor must
    structurally exclude. links maps relationship ids to External
    hyperlink targets planted in the FIRST deck slide's rels part
    (how a:hlinkClick actions resolve) — the opc_hyperlinks carrier."""
    n = len(slides)
    slide_xmls = []
    for shapes in slides:
        slide_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:sld xmlns:p="{_P_NS}" xmlns:a="{_A_NS}" xmlns:r="{_R_NS}">'
            f'<p:cSld><p:spTree>{"".join(shapes)}</p:spTree></p:cSld></p:sld>'
        )
    # the part-name trap: deck slide i lives in slide{n-i}.xml
    part_of = {i: f"ppt/slides/slide{n - i}.xml" for i in range(n)}
    sld_ids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rIdS{i + 1}"/>' for i in range(n)
    )
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:presentation xmlns:p="{_P_NS}" xmlns:r="{_R_NS}">'
        f"<p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>"
    )
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rIdS{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/slide" '
            f'Target="slides/slide{n - i}.xml"/>'
            for i in range(n)
        )
        + "</Relationships>"
    )
    ct_slides = "".join(
        f'<Override PartName="/ppt/slides/slide{i + 1}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
        for i in range(n)
    )
    root_rels = _ROOT_RELS
    extra_parts: list[tuple[str, str]] = []
    if core_props:
        from toyocr_spark.fixtures.genopc import CORE_CT_OVERRIDE, CORE_REL, core_part

        ct_slides += CORE_CT_OVERRIDE
        root_rels = root_rels.replace("</Relationships>", CORE_REL + "</Relationships>")
        extra_parts.append(core_part(core_props))
    parts: list[tuple[str, str]] = [
        (
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType='
            '"application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.'
            'openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
            f"{ct_slides}</Types>",
        ),
        ("_rels/.rels", root_rels),
        ("ppt/presentation.xml", presentation),
        ("ppt/_rels/presentation.xml.rels", pres_rels),
    ]
    for i, xml in enumerate(slide_xmls):
        parts.append((part_of[i], xml))
    if links:
        slide_part = part_of[0].rsplit("/", 1)[-1]  # deck slide 1's part
        parts.append(
            (
                f"ppt/slides/_rels/{slide_part}.rels",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<Relationships xmlns="http://schemas.openxmlformats.org/'
                'package/2006/relationships">'
                + "".join(
                    f'<Relationship Id="{rid}" Type="http://schemas.'
                    "openxmlformats.org/officeDocument/2006/relationships/"
                    f'hyperlink" Target="{_esc(target)}" TargetMode="External"/>'
                    for rid, target in links.items()
                )
                + "</Relationships>",
            )
        )
    for i, note in enumerate(notes or []):
        parts.append(
            (
                f"ppt/notesSlides/notesSlide{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<p:notes xmlns:p="{_P_NS}" xmlns:a="{_A_NS}">'
                f"<p:cSld><p:spTree>{shape([note])}</p:spTree></p:cSld></p:notes>",
            )
        )
    parts.extend(extra_parts)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, content in parts:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.create_system = 0
            zf.writestr(zi, content)
    return buf.getvalue()

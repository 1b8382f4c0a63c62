"""Shared OPC fixture pieces: the docProps/core.xml core-properties
part all three OOXML builders (gendocx/genxlsx/genpptx) can wire in —
one content-type override, one package-relationship entry, one part
body. Mirrors how real writers emit the part."""

from __future__ import annotations

CORE_CT_OVERRIDE = (
    '<Override PartName="/docProps/core.xml" ContentType='
    '"application/vnd.openxmlformats-package.core-properties+xml"/>'
)

CORE_REL = (
    '<Relationship Id="rIdCore" Type="http://schemas.openxmlformats.org/'
    'package/2006/relationships/metadata/core-properties" '
    'Target="docProps/core.xml"/>'
)

_TAGS: dict[str, tuple[str, bool]] = {
    # key -> (qualified tag, is W3CDTF date)
    "title": ("dc:title", False),
    "creator": ("dc:creator", False),
    "subject": ("dc:subject", False),
    "keywords": ("cp:keywords", False),
    "description": ("dc:description", False),
    "last_modified_by": ("cp:lastModifiedBy", False),
    "revision": ("cp:revision", False),
    "created": ("dcterms:created", True),
    "modified": ("dcterms:modified", True),
}


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def core_part(props: dict[str, str]) -> tuple[str, str]:
    """("docProps/core.xml", xml) for the given properties (keys from
    extractor.opc._PROPS; unknown keys raise — fixtures must not
    silently plant nothing)."""
    body = []
    for key, value in props.items():
        if key not in _TAGS:
            raise ValueError(f"unknown core property {key!r}")
        tag, is_date = _TAGS[key]
        attr = ' xsi:type="dcterms:W3CDTF"' if is_date else ""
        body.append(f"<{tag}{attr}>{_esc(value)}</{tag}>")
    xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/'
        'package/2006/metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/" '
        'xmlns:dcterms="http://purl.org/dc/terms/" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
        + "".join(body)
        + "</cp:coreProperties>"
    )
    return "docProps/core.xml", xml

"""Deterministic OpenDocument Spreadsheet (.ods) fixture builder —
the ODF twin of fixtures/genxlsx.py: a real ODF package (STORED
`mimetype` member FIRST per the spec, manifest, content.xml)
assembled from pure stdlib, so extractor/ods.py is tested against
files any conformant ODF reader opens.

Cell specs exercise the format's distinctive shapes on demand:
column-repeat RLE (`repeat=`), merged-cell continuations
(`covered()`), inline annotations the extractor must skip
(`annotation=`), and link-wrapped cell text (`link=`).

Determinism: ZIP_STORED members with the epoch date_time and no
platform extra fields — identical bytes for identical inputs on every
host (the byte-identity north rule extends to fixture generation)."""

from __future__ import annotations

import io
import zipfile

MIMETYPE = "application/vnd.oasis.opendocument.spreadsheet"

_NSDECL = (
    ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
    ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
    ' xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"'
    ' xmlns:xlink="http://www.w3.org/1999/xlink"'
)

_MANIFEST = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<manifest:manifest xmlns:manifest='
    '"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">'
    f'<manifest:file-entry manifest:full-path="/" manifest:media-type="{MIMETYPE}"/>'
    '<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>'
    "</manifest:manifest>"
)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def covered() -> dict:
    """A merged-cell continuation — contributes nothing."""
    return {"covered": True}


def _cell_xml(spec) -> str:
    """One cell spec -> table:table-cell XML. A spec is a plain value
    (str/int/float -> its lexical form) or a dict with keys text,
    repeat, annotation, link, covered."""
    if not isinstance(spec, dict):
        spec = {"text": spec}
    if spec.get("covered"):
        return "<table:covered-table-cell/>"
    text = spec.get("text", "")
    text = text if isinstance(text, str) else str(text)
    inner = _esc(text)
    if spec.get("link") is not None:
        inner = (
            f'<text:a xlink:type="simple" xlink:href="{_esc(spec["link"])}">'
            f"{inner}</text:a>"
        )
    note = ""
    if spec.get("annotation") is not None:
        note = (
            "<office:annotation><text:p>"
            + _esc(spec["annotation"])
            + "</text:p></office:annotation>"
        )
    rep = (
        f' table:number-columns-repeated="{int(spec["repeat"])}"'
        if spec.get("repeat", 1) != 1
        else ""
    )
    body = note + (f"<text:p>{inner}</text:p>" if text != "" else "")
    return f"<table:table-cell{rep}>{body}</table:table-cell>"


def row(cells: list, repeat: int = 1) -> str:
    rep = f' table:number-rows-repeated="{int(repeat)}"' if repeat != 1 else ""
    return (
        f"<table:table-row{rep}>"
        + "".join(_cell_xml(c) for c in cells)
        + "</table:table-row>"
    )


def build_ods(sheets: dict[str, list], header_rows: int = 0) -> bytes:
    """Assemble an .ods: sheets maps name -> rows, each row a list of
    cell specs (see _cell_xml) or a pre-built <table:table-row> string
    from row(). The first `header_rows` rows of each sheet wrap in
    <table:table-header-rows> (the walk must descend the container)."""
    tables = []
    for name, rows in sheets.items():
        rows_xml = [r if isinstance(r, str) else row(r) for r in rows]
        head = (
            "<table:table-header-rows>"
            + "".join(rows_xml[:header_rows])
            + "</table:table-header-rows>"
            if header_rows
            else ""
        )
        tables.append(
            f'<table:table table:name="{_esc(name)}">'
            + head
            + "".join(rows_xml[header_rows:])
            + "</table:table>"
        )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<office:document-content{_NSDECL}>"
        "<office:body><office:spreadsheet>"
        + "".join(tables)
        + "</office:spreadsheet></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, data in (
            ("mimetype", MIMETYPE),
            ("META-INF/manifest.xml", _MANIFEST),
            ("content.xml", content),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.create_system = 0
            zf.writestr(zi, data)
    return buf.getvalue()

"""Deterministic OOXML (.xlsx) fixture builder — the SpreadsheetML
twin of fixtures/gendocx.py: a valid OPC package ([Content_Types].xml,
package + workbook rels, workbook, worksheets, sharedStrings) from
pure stdlib, so extractor/xlsx.py is exercised against files any
conformant reader opens. String cells round-trip through the REAL
sharedStrings indirection (t="s" + index), numbers stay inline —
the two cell paths a crawl actually contains.

Determinism: ZIP_STORED, epoch date_time, pinned create_system."""

from __future__ import annotations

import io
import zipfile

_S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_R_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
    "{sheet_overrides}</Types>"
)

_SHEET_CT = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _col_ref(idx: int) -> str:
    """0-based column index -> A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def build_xlsx(
    sheets: dict[str, list[list[str | int | float]]],
    core_props: dict[str, str] | None = None,
) -> bytes:
    """sheets: {sheet_name: rows}, each row a list of cells — str cells
    go through sharedStrings (t="s"), numbers inline (<v> lexical form
    preserved). Sheet order = dict order. core_props plants a
    docProps/core.xml part."""
    shared: list[str] = []
    shared_idx: dict[str, int] = {}
    sheet_xmls: list[str] = []
    for rows in sheets.values():
        body_rows: list[str] = []
        for r, row in enumerate(rows, start=1):
            cells = []
            for ci, cell in enumerate(row):
                ref = f"{_col_ref(ci)}{r}"
                if isinstance(cell, str):
                    if cell not in shared_idx:
                        shared_idx[cell] = len(shared)
                        shared.append(cell)
                    cells.append(
                        f'<c r="{ref}" t="s"><v>{shared_idx[cell]}</v></c>'
                    )
                else:
                    cells.append(f'<c r="{ref}"><v>{cell}</v></c>')
            body_rows.append(f'<row r="{r}">{"".join(cells)}</row>')
        sheet_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{_S_NS}"><sheetData>{"".join(body_rows)}'
            "</sheetData></worksheet>"
        )
    sheet_decls = "".join(
        f'<sheet name="{_esc(name)}" sheetId="{i + 1}" r:id="rIdS{i + 1}"/>'
        for i, name in enumerate(sheets)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_S_NS}" xmlns:r="{_R_NS}">'
        f"<sheets>{sheet_decls}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rIdS{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        + '<Relationship Id="rIdSS" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    shared_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_S_NS}" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f'<si><t xml:space="preserve">{_esc(s)}</t></si>' for s in shared)
        + "</sst>"
    )
    sheet_overrides = "".join(_SHEET_CT.format(i=i + 1) for i in range(len(sheets)))
    root_rels = _ROOT_RELS
    extra_parts: list[tuple[str, str]] = []
    if core_props:
        from toyocr_spark.fixtures.genopc import CORE_CT_OVERRIDE, CORE_REL, core_part

        sheet_overrides += CORE_CT_OVERRIDE
        root_rels = root_rels.replace("</Relationships>", CORE_REL + "</Relationships>")
        extra_parts.append(core_part(core_props))
    parts: list[tuple[str, str]] = [
        (
            "[Content_Types].xml",
            _CONTENT_TYPES.format(sheet_overrides=sheet_overrides),
        ),
        ("_rels/.rels", root_rels),
        ("xl/workbook.xml", workbook),
        ("xl/_rels/workbook.xml.rels", wb_rels),
        ("xl/sharedStrings.xml", shared_xml),
    ]
    for i, xml in enumerate(sheet_xmls):
        parts.append((f"xl/worksheets/sheet{i + 1}.xml", xml))
    parts.extend(extra_parts)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, content in parts:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.create_system = 0
            zf.writestr(zi, content)
    return buf.getvalue()

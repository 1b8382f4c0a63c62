"""Deterministic OpenDocument Presentation (.odp) fixture builder —
the ODF twin of fixtures/genpptx.py: a real ODF package (STORED
`mimetype` member FIRST per the spec, manifest, content.xml)
assembled from pure stdlib, so extractor/odp.py is tested against
files any conformant ODF reader opens.

Each slide carries an optional title frame (presentation:class
"title"), body paragraphs in an outline text:list (the walk must
descend list nesting), and an optional INLINE speaker-notes plant
(<presentation:notes> with its own frame — content the extractor must
exclude STRUCTURALLY, the pptx notes-part twin living inside
content.xml).

Determinism: ZIP_STORED members with the epoch date_time and no
platform extra fields — identical bytes for identical inputs on every
host (the byte-identity north rule extends to fixture generation)."""

from __future__ import annotations

import io
import zipfile

MIMETYPE = "application/vnd.oasis.opendocument.presentation"

_NSDECL = (
    ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
    ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
    ' xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"'
    ' xmlns:presentation="urn:oasis:names:tc:opendocument:xmlns:presentation:1.0"'
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


def _para(text: str, link: str | None = None) -> str:
    inner = _esc(text)
    if link is not None:
        inner = f'<text:a xlink:type="simple" xlink:href="{_esc(link)}">{inner}</text:a>'
    return f"<text:p>{inner}</text:p>"


def frame(
    paragraphs: list[str | tuple[str, str]],
    cls: str | None = None,
    as_list: bool = False,
) -> str:
    """One draw:frame with a text box. A paragraph is a string or a
    (text, link) tuple. as_list nests them in an outline text:list,
    one list-item each (the body-placeholder shape)."""
    paras = [
        _para(*p) if isinstance(p, tuple) else _para(p) for p in paragraphs
    ]
    if as_list:
        inner = (
            "<text:list>"
            + "".join(f"<text:list-item>{p}</text:list-item>" for p in paras)
            + "</text:list>"
        )
    else:
        inner = "".join(paras)
    cls_attr = f' presentation:class="{cls}"' if cls else ""
    return (
        f"<draw:frame{cls_attr}><draw:text-box>"
        + inner
        + "</draw:text-box></draw:frame>"
    )


def build_odp(
    slides: list[dict],
    master_text: str | None = None,
) -> bytes:
    """Assemble an .odp: each slide dict has optional keys
    title (str), body (list of paragraphs for an outline frame),
    frames_xml (pre-built frame() strings), notes (str — planted as an
    INLINE presentation:notes frame the extractor must never read).
    master_text plants chrome in a <style:master-page>-less spot:
    office:master-styles inside a separate styles.xml is not read by
    the walk; here the notes plant is the structural trap."""
    pages = []
    for i, s in enumerate(slides):
        frames = []
        if s.get("title") is not None:
            frames.append(frame([s["title"]], cls="title"))
        if s.get("body"):
            frames.append(frame(list(s["body"]), cls="outline", as_list=True))
        frames.extend(s.get("frames_xml", []))
        notes = ""
        if s.get("notes") is not None:
            notes = (
                "<presentation:notes>"
                + frame([s["notes"]], cls="notes")
                + "</presentation:notes>"
            )
        pages.append(
            f'<draw:page draw:name="page{i + 1}">'
            + "".join(frames)
            + notes
            + "</draw:page>"
        )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<office:document-content{_NSDECL}>"
        "<office:body><office:presentation>"
        + "".join(pages)
        + "</office:presentation></office:body></office:document-content>"
    )
    members = [
        ("mimetype", MIMETYPE),
        ("META-INF/manifest.xml", _MANIFEST),
        ("content.xml", content),
    ]
    if master_text is not None:
        styles = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            f"<office:document-styles{_NSDECL}"
            ' xmlns:style="urn:oasis:names:tc:opendocument:xmlns:style:1.0">'
            "<office:master-styles>"
            '<style:master-page style:name="Default">'
            + frame([master_text])
            + "</style:master-page>"
            "</office:master-styles></office:document-styles>"
        )
        members.append(("styles.xml", styles))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.create_system = 0
            zf.writestr(zi, data)
    return buf.getvalue()

"""Deterministic legacy PowerPoint (.ppt / [MS-PPT]) fixture builder —
the binary twin of fixtures/genpptx.py: a real PowerPoint Document
record tree (DocumentContainer holding slide- and notes-collection
SlideListWithText containers of TextHeaderAtom + TextCharsAtom /
TextBytesAtom records) inside a real compound file
(fixtures/gendoc.build_cfb).

What the builder deliberately exercises:
  * BOTH text encodings (TextBytesAtom one-byte chars when the text
    allows, TextCharsAtom UTF-16 otherwise — chosen per atom, the
    same auto rule real writers use);
  * a notes SlideListWithText (recInstance 2) and a master collection
    (recInstance 1) planted with text the extractor must exclude
    structurally;
  * multi-paragraph text atoms (\\r-separated) and title typing.

Determinism: pure function of the inputs — identical bytes for
identical inputs on every host."""

from __future__ import annotations

import struct

from toyocr_spark.fixtures.gendoc import build_cfb

_DOCUMENT_CONTAINER = 0x03E8
_SLIDE_LIST_WITH_TEXT = 0x0FF0
_SLIDE_PERSIST_ATOM = 0x03F3
_TEXT_HEADER_ATOM = 0x0F9F
_TEXT_CHARS_ATOM = 0x0FA0
_TEXT_BYTES_ATOM = 0x0FA8

TX_TITLE = 0
TX_BODY = 1
TX_NOTES = 2
TX_CENTER_TITLE = 6


def _atom(rec_type: int, payload: bytes, instance: int = 0) -> bytes:
    return struct.pack("<HHI", instance << 4, rec_type, len(payload)) + payload


def _container(rec_type: int, payload: bytes, instance: int = 0) -> bytes:
    return struct.pack("<HHI", (instance << 4) | 0x0F, rec_type, len(payload)) + payload


def _text_atoms(tx_type: int, paragraphs: list[str]) -> bytes:
    """TextHeaderAtom + one text atom carrying \\r-joined paragraphs,
    byte chars when the text allows, UTF-16 otherwise."""
    text = "\r".join(paragraphs)
    out = _atom(_TEXT_HEADER_ATOM, struct.pack("<I", tx_type))
    if all(ord(c) < 0x100 for c in text):
        out += _atom(_TEXT_BYTES_ATOM, text.encode("latin-1"))
    else:
        out += _atom(_TEXT_CHARS_ATOM, text.encode("utf-16-le"))
    return out


def build_ppt(
    slides: list[dict],
    notes: list[str] | None = None,
    master_text: str = "Master layout chrome placeholder",
) -> bytes:
    """Assemble a .ppt: slides = [{'title': str | None, 'body':
    [paragraph, ...]}]; notes text and the master collection are
    planted as content the extractor must exclude."""
    slide_payload = b""
    for i, slide in enumerate(slides):
        slide_payload += _atom(
            _SLIDE_PERSIST_ATOM, struct.pack("<IIiI", 256 + i, 0, 0, 0)
        )
        title = slide.get("title")
        if title:
            slide_payload += _text_atoms(TX_TITLE, [title])
        body = slide.get("body") or []
        if body:
            slide_payload += _text_atoms(TX_BODY, list(body))
    doc = _container(_SLIDE_LIST_WITH_TEXT, slide_payload, instance=0)
    doc += _container(
        _SLIDE_LIST_WITH_TEXT, _text_atoms(TX_BODY, [master_text]), instance=1
    )
    if notes:
        doc += _container(
            _SLIDE_LIST_WITH_TEXT, _text_atoms(TX_NOTES, list(notes)), instance=2
        )
    stream = _container(_DOCUMENT_CONTAINER, doc)
    return build_cfb([("PowerPoint Document", stream)])

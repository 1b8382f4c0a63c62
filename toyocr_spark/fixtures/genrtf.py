"""Deterministic RTF fixture builder: real control-word layout
(\\rtf1 header, fonttbl/colortbl destinations, header/footer
destinations, HYPERLINK fields, \\'hh and \\uN escapes) from pure
stdlib — extractor/rtf.py is exercised against documents a
conformant legacy reader opens."""

from __future__ import annotations


def _esc(s: str) -> str:
    """RTF-escape text: braces/backslash, then any non-cp1252-safe or
    non-ASCII char as \\uN with a '?' fallback (the modern-writer
    convention, \\uc1)."""
    out: list[str] = []
    for ch in s:
        if ch in "\\{}":
            out.append("\\" + ch)
        elif ord(ch) < 128:
            out.append(ch)
        else:
            try:
                b = ch.encode("cp1252")
                out.append(f"\\'{b[0]:02x}")
            except UnicodeEncodeError:
                cp = ord(ch)
                if cp > 32767:
                    cp -= 65536
                out.append(f"\\u{cp}?")
    return "".join(out)


def paragraph(text: str, fs: int | None = None, link: str | None = None) -> str:
    """One paragraph: fs plants a half-point font size (>=28 -> the
    title rule); link wraps the text in a HYPERLINK field."""
    body = _esc(text)
    if link is not None:
        body = (
            "{\\field{\\*\\fldinst HYPERLINK \"" + link + "\"}"
            "{\\fldrslt " + body + "}}"
        )
    if fs is not None:
        body = f"\\fs{fs} " + body
    return "{\\pard " + body + "\\par}"


def build_rtf(
    body: list[str],
    header_text: str | None = None,
    footer_text: str | None = None,
) -> bytes:
    """body: paragraph() fragments in order. header/footer plant the
    destinations the extractor must structurally exclude."""
    parts = [
        "{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1",
        "{\\fonttbl{\\f0\\froman Times New Roman;}{\\f1\\fswiss Arial;}}",
        "{\\colortbl ;\\red0\\green0\\blue255;}",
        "{\\stylesheet{\\s0 Normal;}{\\s1\\fs32 heading 1;}}",
        "{\\info{\\title fixture doc}{\\author nobody}}",
    ]
    if header_text is not None:
        parts.append("{\\header \\pard " + _esc(header_text) + "\\par}")
    if footer_text is not None:
        parts.append("{\\footer \\pard " + _esc(footer_text) + "\\par}")
    parts.extend(body)
    parts.append("}")
    return "".join(parts).encode("ascii")

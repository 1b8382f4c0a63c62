"""Deterministic MHTML (.mht) fixture builder — the web-archive twin
of fixtures/gendocx.py: a real RFC 2557 multipart/related envelope
(header block, boundary-delimited parts, quoted-printable / base64
transfer encodings, Content-Location per part) assembled from pure
stdlib, so extractor/mhtml.py is tested against archives any MIME
reader opens, not against its own parser.

Determinism: fixed boundary, fixed header order, CRLF throughout,
stdlib quopri/base64 encoders — identical bytes for identical inputs
on every host (the byte-identity north rule extends to fixture
generation)."""

from __future__ import annotations

import base64
import quopri

_BOUNDARY = "----=_NextPart_FIXTURE_0001"

# a tiny valid PNG-ish payload for resource parts; content is
# irrelevant (resources are never read), it just has to be binary
_IMG_BYTES = bytes(range(256))


def _encode(payload: bytes, encoding: str) -> bytes:
    if encoding == "quoted-printable":
        return quopri.encodestring(payload)
    if encoding == "base64":
        return base64.encodebytes(payload)
    if encoding in ("7bit", "8bit", "binary"):
        return payload
    raise ValueError(f"unknown transfer encoding {encoding!r}")


def build_mht(
    html: str | list[str],
    charset: str = "utf-8",
    encoding: str = "quoted-printable",
    location: str = "https://saved.example/page.html",
    with_image: bool = True,
    subject: str = "Saved Page",
) -> bytes:
    """Assemble an .mht archive: `html` = the saved document's markup,
    or a list of markups (one text/html part each — the legacy
    frameset shape). `encoding` sets the transfer encoding of the
    html parts; an image resource part (base64, never read by the
    extractor) rides along unless with_image=False."""
    markups = [html] if isinstance(html, str) else list(html)
    lines: list[bytes] = [
        b"From: <Saved by a fixture writer>",
        b"Subject: " + subject.encode("ascii"),
        b"MIME-Version: 1.0",
        b'Content-Type: multipart/related; type="text/html";',
        f'\tboundary="{_BOUNDARY}"'.encode("ascii"),
        b"",
        b"This is a multi-part message in MIME format.",
    ]
    for i, markup in enumerate(markups):
        loc = location if i == 0 else f"{location}?frame={i}"
        lines += [
            b"",
            f"--{_BOUNDARY}".encode("ascii"),
            f"Content-Type: text/html; charset={charset}".encode("ascii"),
            f"Content-Transfer-Encoding: {encoding}".encode("ascii"),
            f"Content-Location: {loc}".encode("ascii"),
            b"",
            _encode(markup.encode(charset), encoding).rstrip(b"\n"),
        ]
    if with_image:
        lines += [
            b"",
            f"--{_BOUNDARY}".encode("ascii"),
            b"Content-Type: image/png",
            b"Content-Transfer-Encoding: base64",
            f"Content-Location: {location.rsplit('/', 1)[0]}/logo.png".encode("ascii"),
            b"",
            base64.encodebytes(_IMG_BYTES).rstrip(b"\n"),
        ]
    lines += [b"", f"--{_BOUNDARY}--".encode("ascii"), b""]
    return b"\r\n".join(lines)

"""MHTML (.mht, RFC 2557 multipart/related web archive) tokenizer —
the ninth leg of the magic-byte format dispatch. Browsers' "save page
as single file" output: a MIME envelope whose parts are the page's
HTML plus its resources (images, CSS), each under a transfer encoding
(quoted-printable or base64).

Shared-kernel design, the EPUB pattern: the container walk only
resolves WHICH bytes are HTML and undoes the transfer encoding; every
text/html part then runs through the EXISTING HTML tokenizer
unchanged, so boilerplate dies by exactly the rules the live page
would face. All text/html parts tokenize in envelope order — for a
normal save that is the one root document; for legacy frameset saves
it is the frames in the order the archiver wrote them.

Reference analogue: the byte -> array decode seam
(/root/reference/data/dataset_mapper.py:151-155).

Determinism: the stdlib email parser never raises on malformed input
(it degrades to defects), and any part whose payload fails to decode
is skipped — the quiet-skip fuzz contract every codec here carries.
"""

from __future__ import annotations

import re

from toyocr_spark.extractor.tokenizer import Block, tokenize

# first line of a MIME envelope is a header ("From: <Saved by ...>",
# "MIME-Version: 1.0", ...) — printable token, colon. HTML never is.
_HDR_LINE = re.compile(rb"^[!-9;-~]+:[ \t]")


def is_mhtml(data: bytes | str | None) -> bool:
    """Header-shaped first line + both MIME markers near the head.
    (MHTML has no magic bytes; every writer puts MIME-Version and the
    multipart/related content type in the first kilobytes, and no HTML
    page starts with a header line.)"""
    if not isinstance(data, (bytes, bytearray)):
        return False
    head = bytes(data[:4096])
    if not _HDR_LINE.match(head):
        return False
    low = head.lower()
    return b"mime-version:" in low and b"multipart/related" in low


def _html_parts(data: bytes) -> list[bytes | str]:
    """Decoded text/html part payloads in envelope order. A part with
    an explicit charset decodes here (MIME metadata wins, RFC 2557);
    otherwise raw bytes pass through so the HTML tokenizer's own
    charset sniffing (BOM / <meta charset>) applies unchanged."""
    import email
    from email import policy

    msg = email.message_from_bytes(bytes(data), policy=policy.compat32)
    out: list[bytes | str] = []
    for part in msg.walk():
        if part.get_content_type() != "text/html":
            continue
        try:
            payload = part.get_payload(decode=True)
        except Exception:  # noqa: BLE001 — quiet-skip fuzz contract
            continue
        if payload is None:
            continue
        charset = part.get_content_charset()
        if charset:
            try:
                out.append(payload.decode(charset))
                continue
            except (LookupError, UnicodeDecodeError):
                pass  # bogus label: fall through to the sniffing path
        out.append(payload)
    return out


def tokenize_mhtml(data: bytes) -> list[Block]:
    """Parse an MHTML archive into Blocks: each text/html part through
    the ordinary HTML tokenizer, ordinals renumbered across the whole
    archive (the EPUB discipline, so islands can span frame
    boundaries). Malformed envelopes tokenize to []."""
    try:
        parts = _html_parts(data)
    except Exception:  # noqa: BLE001 — quiet-skip fuzz contract
        return []
    blocks: list[Block] = []
    for body in parts:
        blocks.extend(tokenize(body))
    for i, b in enumerate(blocks):
        b.ordinal = i
    return blocks


_HREF_RE = re.compile(r'(?i)href="([^"]+)"')


def mhtml_links(data: bytes) -> list[str]:
    """Outbound ABSOLUTE links from text/html parts in envelope order,
    duplicates preserved — the MHTML leg of outlink mining (the
    epub_links contract: relative hrefs inside an archive point at
    captured siblings, navigation not edges; transfer-encoded markup
    means the raw-regexp HTML leg would mine QP-mangled targets, so
    the decode must happen HERE). Malformed envelopes -> []."""
    try:
        parts = _html_parts(data)
    except Exception:  # noqa: BLE001
        return []
    out: list[str] = []
    for body in parts:
        if isinstance(body, bytes):
            try:
                body = body.decode("utf-8")
            except UnicodeDecodeError:
                body = body.decode("latin-1")
        for m in _HREF_RE.finditer(body):
            href = m.group(1)
            if "://" in href:
                out.append(href)
    return out

"""MOBI / PalmDOC (.mobi, .prc) format leg — the Kindle-era e-book
container found throughout book-corpus crawls (Project Gutenberg
mirrors, free libraries, the MobileRead archives).

Layout (public PDB/MOBI documentation): a Palm Database (PDB) file —
32-byte name, attributes, then at offset 76 a record count (UINT16 BE)
and per-record 8-byte entries whose first 4 bytes are the record's
absolute offset. The type/creator pair at offset 60 reads
``BOOKMOBI`` — a true 8-byte magic. Record 0 opens with the PalmDOC
header (compression UINT16 BE: 1 = none, 2 = PalmDOC; text length
UINT32 BE; text-record count UINT16 BE), followed by the ``MOBI``
header (text encoding UINT32 BE at its offset 28-4: 1252 or 65001)
and, when flagged, an EXTH metadata block (author/publisher chrome —
never read as text, the FB2 description rule). Records 1..N carry the
book text — HTML — in PalmDOC compression: a byte-pair LZ77 with
three token classes (literal runs, 11-bit-distance back-references,
space+char packs). The decompressed HTML re-enters the SHARED HTML
tokenizer, so scoring/XY-cut/selection behave exactly as for a crawled
page (the EPUB discipline: container strip, then one kernel).

Graft note: same byte->blocks decode seam as every leg
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations

_MAGIC_OFFSET = 60
_MAGIC = b"BOOKMOBI"

# decompressed-output bound per book: PalmDOC records are <= 4096 bytes
# decompressed by spec, but a hostile record count must not inflate
# unbounded (the PNG/zip bounded-inflate rule)
MAX_TEXT_BYTES = 8 << 20


def is_mobi(data: bytes | str | None) -> bool:
    return (
        isinstance(data, (bytes, bytearray))
        and len(data) > _MAGIC_OFFSET + 8
        and bytes(data[_MAGIC_OFFSET : _MAGIC_OFFSET + 8]) == _MAGIC
    )


def palmdoc_decompress(data: bytes, limit: int = MAX_TEXT_BYTES) -> bytes:
    """PalmDOC LZ77: 0x00 and 0x09-0x7F literal byte; 0x01-0x08 = copy
    that many following bytes verbatim; 0x80-0xBF = two-byte token,
    distance = top 11 bits of the 14-bit payload, length = low 3 bits
    + 3 (overlapping copies legal, the classic LZ77 repeat); 0xC0-0xFF
    = a space plus (byte XOR 0x80). Output-bounded; malformed
    back-references (distance 0 or beyond start) stop the decode
    rather than guess."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and len(out) < limit:
        c = data[pos]
        pos += 1
        if c == 0x00 or 0x09 <= c <= 0x7F:
            out.append(c)
        elif 0x01 <= c <= 0x08:
            out += data[pos : pos + c]
            pos += c
        elif 0x80 <= c <= 0xBF:
            if pos >= n:
                break
            pair = (c << 8) | data[pos]
            pos += 1
            dist = (pair >> 3) & 0x07FF
            length = (pair & 0x07) + 3
            if dist == 0 or dist > len(out):
                break  # malformed back-reference: stop, never guess
            for _ in range(length):
                out.append(out[-dist])
        else:  # 0xC0-0xFF
            out.append(0x20)
            out.append(c ^ 0x80)
    return bytes(out[:limit])


def _parse_pdb(data: bytes) -> list[bytes]:
    """PDB record payloads in order, [] on any malformed boundary."""
    if len(data) < 78:
        return []
    n_rec = int.from_bytes(data[76:78], "big")
    if n_rec == 0 or 78 + 8 * n_rec > len(data):
        return []
    offsets = []
    for i in range(n_rec):
        off = int.from_bytes(data[78 + 8 * i : 78 + 8 * i + 4], "big")
        if off > len(data):
            return []
        offsets.append(off)
    if offsets != sorted(offsets):
        return []
    offsets.append(len(data))
    return [data[offsets[i] : offsets[i + 1]] for i in range(n_rec)]


def mobi_html(data: bytes) -> bytes | None:
    """Container strip: PDB walk -> record 0 headers -> decompress and
    concatenate the text records to the declared text length. Returns
    the raw HTML bytes (with a charset meta wrapper when record 0
    declares cp1252, so the shared decoder sniffs it), or None for
    malformed input (the quiet-skip contract)."""
    records = _parse_pdb(data)
    if not records:
        return None
    r0 = records[0]
    if len(r0) < 16:
        return None
    compression = int.from_bytes(r0[0:2], "big")
    text_length = int.from_bytes(r0[4:8], "big")
    n_text = int.from_bytes(r0[8:10], "big")
    if compression not in (1, 2) or n_text >= len(records):
        return None
    encoding = 65001  # UTF-8 default
    if len(r0) >= 16 + 32 and r0[16:20] == b"MOBI":
        encoding = int.from_bytes(r0[28:32], "big")
    parts = []
    got = 0
    for rec in records[1 : 1 + n_text]:
        if got >= min(text_length, MAX_TEXT_BYTES):
            break
        chunk = palmdoc_decompress(rec) if compression == 2 else rec
        parts.append(chunk)
        got += len(chunk)
    html = b"".join(parts)[: min(text_length, MAX_TEXT_BYTES)]
    if encoding == 1252:
        # surface the declared charset to the shared decoder's
        # <meta charset> sniff instead of decoding here (one decode
        # path for every leg)
        html = b'<meta charset="windows-1252">' + html
    return html


def tokenize_mobi(data: bytes) -> list:
    """MOBI -> Blocks: container strip + PalmDOC decompress, then the
    decompressed HTML re-enters the SHARED HTML tokenizer (the EPUB
    rule — one scoring pass for every markup leg). EXTH metadata is
    chrome by construction: it lives in record 0, which carries no
    text records. Returns [] for malformed containers."""
    from toyocr_spark.extractor.tokenizer import tokenize

    html = mobi_html(data)
    if html is None:
        return []
    return tokenize(html)

"""MOBI fixture writer — an independent PDB/PalmDOC serializer (the
genpdf/gendocx discipline: the builder shares no code with the leg's
parser, and the decompressor is additionally pinned by hand-built
compressed literals in tests/test_mobi.py, so a compressor/decompressor
pair sharing a token-layout bug cannot fake a roundtrip)."""

from __future__ import annotations


def palmdoc_compress(text: bytes) -> bytes:
    """Spec-shaped PalmDOC compressor: emits all three token classes —
    space+char packs for ' '+printable pairs, 2-byte back-references
    for repeats of length 3..10 within the 2047-byte window, literal
    bytes otherwise. Greedy and deliberately simple; correctness, not
    ratio, is the fixture's job."""
    out = bytearray()
    i = 0
    n = len(text)
    while i < n:
        # longest back-reference (length capped at 10, distance < 2048)
        best_len = 0
        best_dist = 0
        if i >= 3:
            start = max(0, i - 2047)
            window = text[start:i]
            for length in range(min(10, n - i), 2, -1):
                idx = window.rfind(text[i : i + length])
                if idx != -1:
                    best_len = length
                    best_dist = len(window) - idx
                    break
        if best_len >= 3:
            pair = 0x8000 | (best_dist << 3) | (best_len - 3)
            out += pair.to_bytes(2, "big")
            i += best_len
            continue
        c = text[i]
        if c == 0x20 and i + 1 < n and 0x40 <= text[i + 1] <= 0x7F:
            out.append(text[i + 1] ^ 0x80)
            i += 2
            continue
        if c == 0x00 or 0x09 <= c <= 0x7F:
            out.append(c)
            i += 1
            continue
        # bytes outside the literal range ride a type-2 literal run
        run = bytearray()
        while i < n and len(run) < 8:
            c = text[i]
            if c != 0x00 and not (0x09 <= c <= 0x7F):
                run.append(c)
                i += 1
            else:
                break
        out.append(len(run))
        out += run
    return bytes(out)


def build_mobi(
    html: bytes,
    compression: int = 2,
    encoding: int = 65001,
    title: str = "fixture",
    author_exth: str = "Metadata Chrome Author",
) -> bytes:
    """One .mobi file: PDB wrapper (BOOKMOBI type/creator), record 0
    with PalmDOC + MOBI headers and an EXTH author entry (metadata the
    extractor must never surface), then 4096-byte text records in the
    requested compression."""
    recs = []
    size = 4096
    chunks = [html[i : i + size] for i in range(0, len(html), size)] or [b""]
    for ch in chunks:
        recs.append(palmdoc_compress(ch) if compression == 2 else ch)

    exth_rec = author_exth.encode("utf-8")
    exth = b"EXTH" + (12 + 8 + len(exth_rec)).to_bytes(4, "big") + (1).to_bytes(4, "big")
    exth += (100).to_bytes(4, "big") + (8 + len(exth_rec)).to_bytes(4, "big") + exth_rec

    mobi_hdr = bytearray(b"MOBI")
    mobi_hdr += (232).to_bytes(4, "big")  # header length
    mobi_hdr += (2).to_bytes(4, "big")  # mobi type: book
    mobi_hdr += encoding.to_bytes(4, "big")
    mobi_hdr += b"\x00" * (232 - len(mobi_hdr))

    r0 = bytearray()
    r0 += (compression).to_bytes(2, "big")
    r0 += b"\x00\x00"
    r0 += len(html).to_bytes(4, "big")
    r0 += len(chunks).to_bytes(2, "big")
    r0 += (4096).to_bytes(2, "big")
    r0 += (0).to_bytes(2, "big")  # encryption
    r0 += b"\x00\x00"
    r0 += mobi_hdr + exth

    all_recs = [bytes(r0), *recs]
    name = title.encode("latin-1", "replace")[:31]
    hdr = bytearray()
    hdr += name + b"\x00" * (32 - len(name))
    hdr += b"\x00" * 28  # attributes/version/dates/mod/backup/appinfo/sortinfo
    hdr += b"BOOKMOBI"
    hdr += b"\x00" * 8  # uniqueIDseed + nextRecordListID
    hdr += len(all_recs).to_bytes(2, "big")
    first = len(hdr) + 8 * len(all_recs) + 2  # +2 pad after entries
    out = bytearray(hdr)
    off = first
    entries = bytearray()
    for i, r in enumerate(all_recs):
        entries += off.to_bytes(4, "big") + (i * 2).to_bytes(4, "big")
        off += len(r)
    out += entries + b"\x00\x00"
    for r in all_recs:
        out += r
    return bytes(out)

"""Deterministic minimal-PDF builder for fixtures and tests.

Emits structurally valid PDF 1.4: catalog / page tree / one page per
content stream (US Letter MediaBox), Helvetica resource, FlateDecode
content streams, a correct xref table and trailer — real enough that
an external viewer parses it, small enough to hand-verify. The fixture
counterpart of the reference's ICDAR->COCO converter
(/root/reference/tools/icdar_converter.py:16-149): golden inputs are
*generated*, never fetched.
"""

from __future__ import annotations

import struct
import zlib


def escape_pdf_text(s: str) -> str:
    """Escape a python string for a PDF literal string ( ... )."""
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def text_stream(ops: list[str]) -> bytes:
    """Join content-stream operator lines into a stream body."""
    return "\n".join(ops).encode("latin-1")


def build_pdf(content_streams: list[bytes], compress: bool = True) -> bytes:
    """Assemble a complete PDF: one page per content stream."""
    n_pages = len(content_streams)
    # object numbering: 1 catalog, 2 pages, 3 font,
    # then per page i: 4+2i page dict, 5+2i content stream
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    for i, content in enumerate(content_streams):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {5 + 2 * i} 0 R "
                f"/Resources << /Font << /F1 3 0 R >> >> >>"
            ).encode()
        )
        body = zlib.compress(content) if compress else content
        filt = b" /Filter /FlateDecode" if compress else b""
        objs.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(body), filt, body)
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: list[int] = []
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1,
        xref_pos,
    )
    return bytes(out)


def wrap_words(text: str, width: int) -> list[str]:
    """Greedy word wrap (deterministic; words longer than width stand
    alone)."""
    lines: list[str] = []
    cur: list[str] = []
    n = 0
    for w in text.split():
        add = len(w) + (1 if cur else 0)
        if cur and n + add > width:
            lines.append(" ".join(cur))
            cur, n = [w], len(w)
        else:
            cur.append(w)
            n += add
    if cur:
        lines.append(" ".join(cur))
    return lines


def paragraph_ops(x: int, y: int, size: int, leading: int, lines: list[str]) -> str:
    """BT..ET operator block for a wrapped paragraph at (x, y) baseline."""
    ops = [f"BT /F1 {size} Tf {leading} TL {x} {y} Td"]
    for j, ln in enumerate(lines):
        if j:
            ops.append("T*")
        ops.append(f"({escape_pdf_text(ln)}) Tj")
    ops.append("ET")
    return "\n".join(ops)


def _cmap_stream(mapping: dict[int, str]) -> bytes:
    """A /ToUnicode CMap stream body covering ``mapping`` (1-byte codes
    -> unicode), bfchar entries in chunks of <= 90 per the CMap spec."""
    codes = sorted(mapping)
    lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CMapName /ToyOCRSubset def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<00> <FF>",
        "endcodespacerange",
    ]
    for i in range(0, len(codes), 90):
        chunk = codes[i : i + 90]
        lines.append(f"{len(chunk)} beginbfchar")
        for c in chunk:
            dst = mapping[c].encode("utf-16-be").hex().upper()
            lines.append(f"<{c:02X}> <{dst}>")
        lines.append("endbfchar")
    lines += ["endcmap", "CMapName currentdict /CMap defineresource pop", "end", "end"]
    return "\n".join(lines).encode("latin-1")


def subset_encode(text: str, offset: int = 0x21) -> tuple[bytes, dict[int, str]]:
    """Simulate an embedded subset font: each distinct character of
    ``text`` gets a glyph code assigned in first-appearance order
    starting at ``offset`` (the way real subsetters number glyphs).
    Returns (encoded bytes, code -> char mapping for the CMap)."""
    mapping: dict[str, int] = {}
    out = bytearray()
    for ch in text:
        code = mapping.get(ch)
        if code is None:
            code = offset + len(mapping)
            if code > 0xFF:
                raise ValueError("fixture text exceeds 1-byte subset space")
            mapping[ch] = code
        out.append(code)
    return bytes(out), {c: ch for ch, c in mapping.items()}


def build_pdf_subset_font(paragraphs: list[list[str]], compress: bool = True) -> bytes:
    """A PDF whose text uses a REMAPPED subset font: string bytes are
    glyph codes (meaningless under Latin-1), recoverable only through
    the embedded /ToUnicode CMap — the embedded-font shape every
    LaTeX/word-processor PDF has. One page; each inner list is a
    paragraph of pre-wrapped lines placed like paragraph_ops does.
    Glyph codes are assigned per-document in first-appearance order."""
    all_text = "".join(ln for para in paragraphs for ln in para)
    _, code_to_char = subset_encode(all_text)
    char_to_code = {ch: c for c, ch in code_to_char.items()}

    ops: list[str] = []
    y = 740
    for para in paragraphs:
        ops.append(f"BT /F1 11 Tf 13 TL 72 {y} Td")
        for j, ln in enumerate(para):
            if j:
                ops.append("T*")
            hexes = "".join(f"{char_to_code[ch]:02X}" for ch in ln)
            ops.append(f"<{hexes}> Tj")
        ops.append("ET")
        y -= 13 * (len(para) + 2)
    content = "\n".join(ops).encode("latin-1")

    cmap = _cmap_stream(code_to_char)
    body = zlib.compress(content) if compress else content
    filt = b" /Filter /FlateDecode" if compress else b""
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        b"<< /Type /Font /Subtype /TrueType /BaseFont /AAAAAA+Subset "
        b"/ToUnicode 6 0 R >>",
        (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 5 0 R /Resources << /Font << /F1 3 0 R >> >> >>"
        ),
        b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(body), filt, body),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: list[int] = []
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1,
        xref_pos,
    )
    return bytes(out)


def build_pdf_differences_font(
    paragraphs: list[list[str]],
    remap: dict[str, str] | None = None,
    compress: bool = True,
) -> bytes:
    """A PDF whose font carries an /Encoding /Differences array — the
    classic pre-Unicode simple-font re-encoding (no ToUnicode). Every
    character listed in ``remap`` (char -> glyph name) is moved to a
    code in 0x80.., recoverable only by resolving the glyph name; all
    other characters ride Latin-1 passthrough. Default remap exercises
    AGL names and the algorithmic uniXXXX family."""
    if remap is None:
        remap = {
            "é": "eacute", "—": "emdash", "ü": "udieresis",
            "ß": "germandbls", "œ": "oe", "€": "uni20AC",
        }
    char_to_code = {ch: 0x80 + i for i, ch in enumerate(remap)}
    diff_parts = ["128"] + ["/" + remap[ch] for ch in remap]

    ops: list[str] = []
    y = 740
    for para in paragraphs:
        ops.append(f"BT /F1 11 Tf 13 TL 72 {y} Td")
        for j, ln in enumerate(para):
            if j:
                ops.append("T*")
            hexes = "".join(
                f"{char_to_code.get(ch, ord(ch)):02X}" for ch in ln
            )
            ops.append(f"<{hexes}> Tj")
        ops.append("ET")
        y -= 13 * (len(para) + 2)
    content = "\n".join(ops).encode("latin-1")
    body = zlib.compress(content) if compress else content
    filt = b" /Filter /FlateDecode" if compress else b""
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding 6 0 R >>",
        (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 5 0 R /Resources << /Font << /F1 3 0 R >> >> >>"
        ),
        b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(body), filt, body),
        b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding /Differences ["
        + " ".join(diff_parts).encode("latin-1")
        + b"] >>",
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: list[int] = []
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1,
        xref_pos,
    )
    return bytes(out)


def _ttf_program(
    code_to_char: dict[int, str], cmap_format: int = 6, symbolic: bool = False
) -> bytes:
    """A minimal-but-real TrueType program carrying just the two tables
    the extractor's FontFile2 path reads: 'cmap' (code -> glyph id;
    format 6 on platform (1,0) or format 4 on (3,1)/(3,0)) and 'post'
    format 2.0 (glyph id -> name; ASCII chars use standard-Macintosh
    order indices, everything else a custom uniXXXX Pascal string).
    ``symbolic`` keys the cmap at 0xF000+code under (3,0), the
    symbolic-font convention."""
    codes = sorted(code_to_char)
    gid_of = {c: i + 1 for i, c in enumerate(codes)}
    key = (lambda c: 0xF000 | c) if symbolic else (lambda c: c)

    if cmap_format == 6:
        first, last = key(codes[0]), key(codes[-1])
        gids = [gid_of.get(c) or 0 for c in range(codes[0], codes[-1] + 1)]
        sub = struct.pack(
            ">HHHHH", 6, 10 + 2 * len(gids), 0, first, last - first + 1
        ) + b"".join(struct.pack(">H", g) for g in gids)
    elif cmap_format == 4:
        segs = [(key(c), key(c), (gid_of[c] - key(c)) & 0xFFFF) for c in codes]
        segs.append((0xFFFF, 0xFFFF, 1))
        n = len(segs)
        sub = struct.pack(">HHHHHHH", 4, 16 + 8 * n, 0, 2 * n, 0, 0, 0)
        sub += b"".join(struct.pack(">H", e) for _, e, _ in segs)
        sub += b"\x00\x00"
        sub += b"".join(struct.pack(">H", s) for s, _, _ in segs)
        sub += b"".join(struct.pack(">H", d) for _, _, d in segs)
        sub += b"\x00\x00" * n  # idRangeOffset: all delta-mapped
    else:
        raise ValueError(f"unsupported fixture cmap format {cmap_format}")

    pid, eid = ((3, 0) if symbolic else (1, 0)) if cmap_format == 6 else (
        (3, 0) if symbolic else (3, 1)
    )
    cmap = struct.pack(">HHHHI", 0, 1, pid, eid, 12) + sub

    n_glyphs = len(codes) + 1
    custom: list[bytes] = []
    idx = [0]  # gid 0 = .notdef
    for c in codes:
        ch = code_to_char[c]
        if " " <= ch <= "~":
            idx.append(ord(ch) - 29)  # standard Macintosh order
        else:
            idx.append(258 + len(custom))
            custom.append(f"uni{ord(ch):04X}".encode("latin-1"))
    post = struct.pack(">IihhIIIII", 0x00020000, 0, 0, 0, 0, 0, 0, 0, 0)
    post += struct.pack(">H", n_glyphs)
    post += b"".join(struct.pack(">H", i) for i in idx)
    post += b"".join(bytes([len(nm)]) + nm for nm in custom)

    tables = [(b"cmap", cmap), (b"post", post)]
    off = 12 + 16 * len(tables)
    header = struct.pack(">IHHHH", 0x00010000, len(tables), 32, 1, 16)
    records, bodies = b"", b""
    for tag, body in tables:
        records += tag + struct.pack(">III", 0, off, len(body))
        bodies += body
        off += len(body)
    return header + records + bodies


def build_pdf_truetype_font(
    paragraphs: list[list[str]],
    compress: bool = True,
    cmap_format: int = 6,
    symbolic: bool = False,
) -> bytes:
    """A PDF whose embedded TrueType font is the ONLY decode metadata:
    no /ToUnicode, no /Differences — string bytes are subset glyph
    codes (ciphertext under Latin-1), recoverable solely through the
    font program's cmap+post tables. The shape of a subsetted
    TrueType PDF from any office suite whose writer skips ToUnicode."""
    all_text = "".join(ln for para in paragraphs for ln in para)
    _, code_to_char = subset_encode(all_text)
    char_to_code = {ch: c for c, ch in code_to_char.items()}

    ops: list[str] = []
    y = 740
    for para in paragraphs:
        ops.append(f"BT /F1 11 Tf 13 TL 72 {y} Td")
        for j, ln in enumerate(para):
            if j:
                ops.append("T*")
            hexes = "".join(f"{char_to_code[ch]:02X}" for ch in ln)
            ops.append(f"<{hexes}> Tj")
        ops.append("ET")
        y -= 13 * (len(para) + 2)
    content = "\n".join(ops).encode("latin-1")
    body = zlib.compress(content) if compress else content
    filt = b" /Filter /FlateDecode" if compress else b""

    ttf = _ttf_program(code_to_char, cmap_format=cmap_format, symbolic=symbolic)
    ttf_body = zlib.compress(ttf) if compress else ttf
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        b"<< /Type /Font /Subtype /TrueType /BaseFont /CCCCCC+Remap "
        b"/FontDescriptor 6 0 R >>",
        (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 5 0 R /Resources << /Font << /F1 3 0 R >> >> >>"
        ),
        b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(body), filt, body),
        b"<< /Type /FontDescriptor /FontName /CCCCCC+Remap /Flags %d "
        b"/FontFile2 7 0 R >>" % (4 if symbolic else 32),
        b"<< /Length %d /Length1 %d%s >>\nstream\n%s\nendstream"
        % (len(ttf_body), len(ttf), filt, ttf_body),
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: list[int] = []
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1,
        xref_pos,
    )
    return bytes(out)


def _cff_index_bytes(items: list[bytes]) -> bytes:
    """Serialize a CFF INDEX (offSize 2 throughout — plenty for
    fixtures)."""
    if not items:
        return struct.pack(">H", 0)
    out = struct.pack(">HB", len(items), 2)
    off = 1
    offs = [off]
    for it in items:
        off += len(it)
        offs.append(off)
    out += b"".join(struct.pack(">H", o) for o in offs)
    return out + b"".join(items)


def _cff_int5(v: int) -> bytes:
    """Fixed-width (29 = 32-bit) DICT integer — layout-independent."""
    return b"\x1d" + struct.pack(">i", v)


def _cff_program(code_to_char: dict[int, str]) -> bytes:
    """A minimal-but-real CFF (Type1C) program: custom Encoding
    (format 0: code -> gid), charset (format 0: gid -> SID; ASCII
    chars use the standard-strings block where SID = ord(ch) - 31,
    everything else a custom uniXXXX string), one endchar CharString
    per glyph. Exactly the table set the extractor's FontFile3 path
    reads."""
    codes = sorted(code_to_char)
    n_glyphs = len(codes) + 1  # + .notdef

    strings: list[bytes] = []
    sids: list[int] = []
    for c in codes:
        ch = code_to_char[c]
        if " " <= ch <= "~":
            sids.append(ord(ch) - 31)
        else:
            sids.append(391 + len(strings))
            strings.append(f"uni{ord(ch):04X}".encode("latin-1"))

    name_ix = _cff_index_bytes([b"ToyOCRSubset"])
    string_ix = _cff_index_bytes(strings)
    gsubr_ix = _cff_index_bytes([])
    encoding = bytes([0, len(codes)]) + bytes(codes)  # format 0
    charset = b"\x00" + b"".join(struct.pack(">H", s) for s in sids)
    charstrings_ix = _cff_index_bytes([b"\x0e"] * n_glyphs)  # endchar

    # Top DICT uses fixed-width ints, so its size is known before the
    # offsets it contains are: charset(15), Encoding(16), CharStrings(17)
    top_size = 3 * (5 + 1)
    top_ix_overhead = struct.pack(">HB", 1, 2) + struct.pack(">HH", 1, 1 + top_size)
    header = bytes([1, 0, 4, 2])
    pre = len(header) + len(name_ix) + len(top_ix_overhead) + top_size
    charset_off = pre + len(string_ix) + len(gsubr_ix)
    encoding_off = charset_off + len(charset)
    charstrings_off = encoding_off + len(encoding)
    top = (
        _cff_int5(charset_off) + b"\x0f"
        + _cff_int5(encoding_off) + b"\x10"
        + _cff_int5(charstrings_off) + b"\x11"
    )
    return (
        header + name_ix + top_ix_overhead + top
        + string_ix + gsubr_ix + charset + encoding + charstrings_ix
    )


def build_pdf_cff_font(paragraphs: list[list[str]], compress: bool = True) -> bytes:
    """A PDF whose embedded CFF (Type1C) program is the ONLY decode
    metadata — no ToUnicode, no Differences: string bytes are subset
    glyph codes recoverable solely through the CFF Encoding + charset
    + strings chain. The LaTeX/Type1-pipeline shape whose writer
    skipped ToUnicode."""
    all_text = "".join(ln for para in paragraphs for ln in para)
    _, code_to_char = subset_encode(all_text)
    char_to_code = {ch: c for c, ch in code_to_char.items()}

    ops: list[str] = []
    y = 740
    for para in paragraphs:
        ops.append(f"BT /F1 11 Tf 13 TL 72 {y} Td")
        for j, ln in enumerate(para):
            if j:
                ops.append("T*")
            hexes = "".join(f"{char_to_code[ch]:02X}" for ch in ln)
            ops.append(f"<{hexes}> Tj")
        ops.append("ET")
        y -= 13 * (len(para) + 2)
    content = "\n".join(ops).encode("latin-1")
    body = zlib.compress(content) if compress else content
    filt = b" /Filter /FlateDecode" if compress else b""

    cff = _cff_program(code_to_char)
    cff_body = zlib.compress(cff) if compress else cff
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /DDDDDD+Remap "
        b"/FontDescriptor 6 0 R >>",
        (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 5 0 R /Resources << /Font << /F1 3 0 R >> >> >>"
        ),
        b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(body), filt, body),
        b"<< /Type /FontDescriptor /FontName /DDDDDD+Remap /Flags 32 "
        b"/FontFile3 7 0 R >>",
        b"<< /Subtype /Type1C /Length %d%s >>\nstream\n%s\nendstream"
        % (len(cff_body), filt, cff_body),
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: list[int] = []
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1,
        xref_pos,
    )
    return bytes(out)


def build_pdf_objstm_font(paragraphs: list[list[str]], compress: bool = True) -> bytes:
    """A PDF 1.5-style document whose FONT DICT lives inside a
    compressed object stream (/Type /ObjStm) — where every modern
    writer puts small dicts. The subset-font bytes are ciphertext
    under Latin-1 and the /ToUnicode reference is reachable only by
    expanding the ObjStm, so extraction proves the expansion is live.
    The CMap itself stays a top-level stream (streams cannot nest in
    an ObjStm, per spec)."""
    all_text = "".join(ln for para in paragraphs for ln in para)
    _, code_to_char = subset_encode(all_text)
    char_to_code = {ch: c for c, ch in code_to_char.items()}

    ops: list[str] = []
    y = 740
    for para in paragraphs:
        ops.append(f"BT /F1 11 Tf 13 TL 72 {y} Td")
        for j, ln in enumerate(para):
            if j:
                ops.append("T*")
            hexes = "".join(f"{char_to_code[ch]:02X}" for ch in ln)
            ops.append(f"<{hexes}> Tj")
        ops.append("ET")
        y -= 13 * (len(para) + 2)
    content = "\n".join(ops).encode("latin-1")
    body = zlib.compress(content) if compress else content
    filt = b" /Filter /FlateDecode" if compress else b""
    cmap = _cmap_stream(code_to_char)

    # members 8 (font dict referencing the top-level CMap) and 9 (info)
    m8 = b"<< /Type /Font /Subtype /TrueType /BaseFont /EEEEEE+Objstm /ToUnicode 6 0 R >>"
    m9 = b"<< /Producer (toyocr fixture) >>"
    header = b"8 0 9 %d " % (len(m8) + 1)
    stm = header + m8 + b" " + m9
    stm_body = zlib.compress(stm) if compress else stm

    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        b"<< /Type /ObjStm /N 2 /First %d /Length %d%s >>\nstream\n%s\nendstream"
        % (len(header), len(stm_body), filt, stm_body),
        (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 5 0 R /Resources << /Font << /F1 8 0 R >> >> >>"
        ),
        b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(body), filt, body),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
    ]
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: list[int] = []
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1,
        xref_pos,
    )
    return bytes(out)


def encrypt_pdf(data: bytes, r: int = 3, length_bits: int = 128, p: int = -44) -> bytes:
    """Encrypt a generated fixture PDF with the standard security
    handler (RC4, V=1/2, R=2/3) and an EMPTY user password — the
    owner-password-only "permissions" scheme real crawl PDFs carry.
    Every object's stream is RC4'd in place with its per-object key
    (offsets unchanged: stream cipher), then the Encrypt dict, /ID,
    and a trailing trailer are appended. Uses the extractor's own key
    derivation and stream-boundary rule so encryptor and decryptor can
    never disagree about WHERE a stream is — only the spec decides
    whether the bytes come back identical."""
    import hashlib

    from toyocr_spark.extractor.pdf import (
        _FULL_OBJ_RE,
        _obj_key,
        _rc4,
        _std_file_key,
        _stream_span,
    )

    assert r in (2, 3)
    v = 1 if r == 2 else 2
    if r == 2:
        length_bits = 40
    o_entry = bytes(range(32))  # arbitrary: we never validate /O
    id0 = hashlib.md5(data).digest()
    file_key = _std_file_key(o_entry, p, id0, r, length_bits)

    import re as _re2
    import zlib as _zlib2

    out = bytearray(data)
    max_num = 0
    for m in _FULL_OBJ_RE.finditer(data):
        num, gen = int(m.group(1)), int(m.group(2))
        max_num = max(max_num, num)
        end = data.find(b"endobj", m.end())
        if end == -1:
            end = len(data)
        obj = data[m.end() : end]
        span = _stream_span(obj)
        if span is None:
            continue
        # ObjStm MEMBER numbers must not collide with the Encrypt
        # object's number either — read them from the plaintext
        # stream before it gets ciphered
        if b"/ObjStm" in obj[: span[0]]:
            body = obj[span[0] : span[1]]
            if b"/FlateDecode" in obj[: span[0]]:
                try:
                    body = _zlib2.decompress(body)
                except _zlib2.error:
                    body = b""
            for pm in _re2.finditer(rb"(\d+)\s+\d+", body[:256]):
                max_num = max(max_num, int(pm.group(1)))
        lo, hi = m.end() + span[0], m.end() + span[1]
        out[lo:hi] = _rc4(_obj_key(file_key, num, gen), data[lo:hi])

    # strings: real writers RC4 every literal string with its object's
    # key and re-escape the ciphertext (the text path never reads dict
    # strings, but /URI link harvesting decrypts them on demand).
    # Splice in REVERSE so earlier offsets stay valid; only /URI
    # strings carry link payloads in these fixtures.
    import re as _re

    uri_hits = []
    for om in _FULL_OBJ_RE.finditer(data):
        oend = data.find(b"endobj", om.end())
        if oend == -1:
            oend = len(data)
        span = _stream_span(data[om.end() : oend])
        dict_end = om.end() + (span[0] if span else (oend - om.end()))
        for um in _re.finditer(rb"/URI\s*\(", data[om.end() : dict_end]):
            uri_hits.append(
                (om.end() + um.end() - 1, int(om.group(1)), int(om.group(2)))
            )
    from toyocr_spark.extractor.pdf import _lit_string, _obj_key as _ok

    for pos, onum, ogen in sorted(uri_hits, reverse=True):
        raw, end = _lit_string(data, pos)
        cipher = _rc4(_ok(file_key, onum, ogen), raw)
        esc = (
            cipher.replace(b"\\", b"\\\\")
            .replace(b"(", b"\\(")
            .replace(b")", b"\\)")
        )
        out[pos : end] = b"(" + esc + b")"

    enc_num = max_num + 1
    enc_obj = (
        f"\n{enc_num} 0 obj\n<< /Filter /Standard /V {v} /R {r} "
        f"/Length {length_bits} /O <{o_entry.hex()}> /U <{bytes(32).hex()}> "
        f"/P {p} >>\nendobj\n"
    ).encode()
    trailer = (
        f"trailer\n<< /Encrypt {enc_num} 0 R /ID [<{id0.hex()}> <{id0.hex()}>] >>\n"
    ).encode()
    return bytes(out) + enc_obj + trailer


def encrypt_pdf_aes(
    data: bytes, p: int = -44, encrypt_metadata: bool = True
) -> bytes:
    """Encrypt a generated fixture PDF with the V4/R4 crypt-filter
    scheme (/StdCF /CFM /AESV2, empty user password): every stream
    body becomes IV + AES-128-CBC ciphertext with PKCS#7 padding (the
    declared /Length rewritten — AES is not length-preserving), every
    /URI literal string is ciphered and re-escaped like real writers
    do. IVs are deterministic (md5('iv' + num + gen + ID0)) so
    fixtures are byte-stable. Shares the extractor's key derivation
    and stream-boundary rule, so only the spec decides whether the
    bytes come back identical — the AES cipher itself is additionally
    pinned by FIPS-197 known-answer vectors, and the key derivation by
    the Algorithm 2/1 known-answer test."""
    import hashlib

    import re as _re

    from toyocr_spark.aescipher import cbc_encrypt
    from toyocr_spark.extractor.pdf import (
        _FULL_OBJ_RE,
        _LENGTH_RE,
        _lit_string,
        _obj_key,
        _std_file_key,
        _stream_span,
    )

    o_entry = bytes(range(32))
    id0 = hashlib.md5(data).digest()
    file_key = _std_file_key(o_entry, p, id0, 4, 128, encrypt_metadata)

    def _iv(num: int, gen: int) -> bytes:
        return hashlib.md5(
            b"iv" + num.to_bytes(4, "big") + gen.to_bytes(4, "big") + id0
        ).digest()[:16]

    # pass 1 — strings: cipher /URI literals in place, splicing in
    # REVERSE so earlier offsets stay valid (stream spans are located
    # per object afterwards, so the length changes here are harmless)
    out = bytearray(data)
    uri_hits = []
    for om in _FULL_OBJ_RE.finditer(data):
        oend = data.find(b"endobj", om.end())
        if oend == -1:
            oend = len(data)
        span = _stream_span(data[om.end() : oend])
        dict_end = om.end() + (span[0] if span else (oend - om.end()))
        for um in _re.finditer(rb"/URI\s*\(", data[om.end() : dict_end]):
            uri_hits.append(
                (om.end() + um.end() - 1, int(om.group(1)), int(om.group(2)))
            )
    for pos, onum, ogen in sorted(uri_hits, reverse=True):
        raw, end = _lit_string(data, pos)
        cipher = cbc_encrypt(
            _obj_key(file_key, onum, ogen, aes=True), _iv(onum, ogen), raw
        )
        esc = (
            cipher.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
        )
        out[pos:end] = b"(" + esc + b")"
    data = bytes(out)

    # pass 2 — streams: rebuild segment by segment (lengths change)
    import zlib as _zlib

    parts: list[bytes] = []
    cursor = 0
    max_num = 0
    for m in _FULL_OBJ_RE.finditer(data):
        num, gen = int(m.group(1)), int(m.group(2))
        max_num = max(max_num, num)
        end = data.find(b"endobj", m.end())
        if end == -1:
            end = len(data)
        obj = data[m.end() : end]
        span = _stream_span(obj)
        if span is None:
            continue
        # ObjStm MEMBER numbers must not collide with the Encrypt
        # object's number either — read them before ciphering
        if b"/ObjStm" in obj[: span[0]]:
            body = obj[span[0] : span[1]]
            if b"/FlateDecode" in obj[: span[0]]:
                try:
                    body = _zlib.decompress(body)
                except _zlib.error:
                    body = b""
            for pm in _re.finditer(rb"(\d+)\s+\d+", body[:256]):
                max_num = max(max_num, int(pm.group(1)))
        lo, hi = m.end() + span[0], m.end() + span[1]
        cipher = cbc_encrypt(
            _obj_key(file_key, num, gen, aes=True), _iv(num, gen), data[lo:hi]
        )
        new_dict, nsub = _LENGTH_RE.subn(
            b"/Length " + str(len(cipher)).encode(), data[m.end() : lo], count=1
        )
        if nsub == 0:
            continue
        parts.append(data[cursor : m.end()])
        parts.append(new_dict)
        parts.append(cipher)
        cursor = hi
    parts.append(data[cursor:])

    enc_num = max_num + 1
    meta = "" if encrypt_metadata else "/EncryptMetadata false "
    enc_obj = (
        f"\n{enc_num} 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128 "
        f"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> "
        f"/StmF /StdCF /StrF /StdCF {meta}"
        f"/O <{o_entry.hex()}> /U <{bytes(32).hex()}> /P {p} >>\nendobj\n"
    ).encode()
    trailer = (
        f"trailer\n<< /Encrypt {enc_num} 0 R /ID [<{id0.hex()}> <{id0.hex()}>] >>\n"
    ).encode()
    return b"".join(parts) + enc_obj + trailer


def encrypt_pdf_aes256(
    data: bytes, p: int = -4, encrypt_metadata: bool = True, r: int = 6
) -> bytes:
    """Encrypt a generated fixture PDF with the PDF 2.0 V5/R6 scheme
    (/StdCF /CFM /AESV3, AES-256-CBC, empty user password): the
    32-byte file key is random-per-file in real writers but derived
    deterministically here (SHA-256 of the plaintext) so fixtures are
    byte-stable; /U //UE //O //OE //Perms are built exactly per
    Algorithm 8/9/10 (spec 7.6.4.4.6-8) via the extractor's own
    _hash_2b so a derivation bug cannot silently agree — _hash_2b is
    ADDITIONALLY pinned by an independent in-test transcription of
    Algorithm 2.B plus the FIPS-180/197 primitives underneath. Streams
    and /URI strings cipher with the FILE key directly (no per-object
    salting in R6), IV deterministic per object."""
    import hashlib

    import re as _re

    from toyocr_spark.aescipher import cbc_encrypt, cbc_encrypt_raw, encrypt_block
    from toyocr_spark.extractor.pdf import (
        _FULL_OBJ_RE,
        _LENGTH_RE,
        _hash_2b,
        _lit_string,
        _stream_span,
    )

    assert r in (5, 6)
    id0 = hashlib.md5(data).digest()
    file_key = hashlib.sha256(b"r6-file-key" + id0).digest()
    if r == 5:  # pre-ISO draft: single-SHA-256 KDF, same entry layout
        _hash_2b = lambda pwd, salt, udata=b"": hashlib.sha256(  # noqa: E731
            pwd + salt + udata
        ).digest()
    vsalt = hashlib.sha256(b"r6-vsalt" + id0).digest()[:8]
    ksalt = hashlib.sha256(b"r6-ksalt" + id0).digest()[:8]
    ovsalt = hashlib.sha256(b"r6-ovsalt" + id0).digest()[:8]
    oksalt = hashlib.sha256(b"r6-oksalt" + id0).digest()[:8]

    u_entry = _hash_2b(b"", vsalt) + vsalt + ksalt
    ue_entry = cbc_encrypt_raw(_hash_2b(b"", ksalt), bytes(16), file_key)
    # owner password also empty; owner hashes take the 48-byte /U as
    # the trailing udata (Algorithm 2.B's third input)
    o_entry = _hash_2b(b"", ovsalt, u_entry) + ovsalt + oksalt
    oe_entry = cbc_encrypt_raw(_hash_2b(b"", oksalt, u_entry), bytes(16), file_key)
    perms_plain = (
        (p & 0xFFFFFFFF).to_bytes(4, "little")
        + b"\xff\xff\xff\xff"
        + (b"T" if encrypt_metadata else b"F")
        + b"adb"
        + hashlib.md5(b"r6-perms" + id0).digest()[:4]
    )
    perms_entry = encrypt_block(file_key, perms_plain)  # AES-ECB, one block

    def _iv(num: int, gen: int) -> bytes:
        return hashlib.md5(
            b"iv256" + num.to_bytes(4, "big") + gen.to_bytes(4, "big") + id0
        ).digest()[:16]

    # pass 1 — strings: cipher /URI literals in place (reverse splice)
    out = bytearray(data)
    uri_hits = []
    for om in _FULL_OBJ_RE.finditer(data):
        oend = data.find(b"endobj", om.end())
        if oend == -1:
            oend = len(data)
        span = _stream_span(data[om.end() : oend])
        dict_end = om.end() + (span[0] if span else (oend - om.end()))
        for um in _re.finditer(rb"/URI\s*\(", data[om.end() : dict_end]):
            uri_hits.append(
                (om.end() + um.end() - 1, int(om.group(1)), int(om.group(2)))
            )
    for pos, onum, ogen in sorted(uri_hits, reverse=True):
        raw, end = _lit_string(data, pos)
        cipher = cbc_encrypt(file_key, _iv(onum, ogen), raw)
        esc = (
            cipher.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
        )
        out[pos:end] = b"(" + esc + b")"
    data = bytes(out)

    # pass 2 — streams: rebuild segment by segment (lengths change)
    import zlib as _zlib

    parts: list[bytes] = []
    cursor = 0
    max_num = 0
    for m in _FULL_OBJ_RE.finditer(data):
        num, gen = int(m.group(1)), int(m.group(2))
        max_num = max(max_num, num)
        end = data.find(b"endobj", m.end())
        if end == -1:
            end = len(data)
        obj = data[m.end() : end]
        span = _stream_span(obj)
        if span is None:
            continue
        # ObjStm MEMBER numbers must not collide with the Encrypt
        # object's number either — read them before ciphering
        if b"/ObjStm" in obj[: span[0]]:
            body = obj[span[0] : span[1]]
            if b"/FlateDecode" in obj[: span[0]]:
                try:
                    body = _zlib.decompress(body)
                except _zlib.error:
                    body = b""
            for pm in _re.finditer(rb"(\d+)\s+\d+", body[:256]):
                max_num = max(max_num, int(pm.group(1)))
        lo, hi = m.end() + span[0], m.end() + span[1]
        cipher = cbc_encrypt(file_key, _iv(num, gen), data[lo:hi])
        new_dict, nsub = _LENGTH_RE.subn(
            b"/Length " + str(len(cipher)).encode(), data[m.end() : lo], count=1
        )
        if nsub == 0:
            continue
        parts.append(data[cursor : m.end()])
        parts.append(new_dict)
        parts.append(cipher)
        cursor = hi
    parts.append(data[cursor:])

    enc_num = max_num + 1
    meta = "" if encrypt_metadata else "/EncryptMetadata false "
    enc_obj = (
        f"\n{enc_num} 0 obj\n<< /Filter /Standard /V 5 /R {r} /Length 256 "
        f"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
        f"/StmF /StdCF /StrF /StdCF {meta}"
        f"/O <{o_entry.hex()}> /OE <{oe_entry.hex()}> "
        f"/U <{u_entry.hex()}> /UE <{ue_entry.hex()}> "
        f"/Perms <{perms_entry.hex()}> /P {p} >>\nendobj\n"
    ).encode()
    trailer = (
        f"trailer\n<< /Encrypt {enc_num} 0 R /ID [<{id0.hex()}> <{id0.hex()}>] >>\n"
    ).encode()
    return b"".join(parts) + enc_obj + trailer

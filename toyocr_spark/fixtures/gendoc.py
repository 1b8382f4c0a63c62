"""Deterministic legacy Word (.doc / [MS-CFB] + [MS-DOC]) fixture
builder — the binary-Office twin of fixtures/gendocx.py: a real
compound-file writer (header, FAT, miniFAT, ministream, red-black-ish
directory) plus a Word 97 binary builder (FIB with true length fields,
piece table with BOTH text encodings, STSH, PAPX FKP pages), so
extractor/doc.py is tested against containers any conformant CFB
reader opens, not against its own parser.

Determinism: pure function of the inputs — zero timestamps, zeroed
CLSIDs, fixed layout order — identical bytes for identical inputs on
every host (the byte-identity north rule extends to fixture
generation).

What the builder deliberately exercises:
  * both piece encodings (fCompressed cp1252 and UTF-16LE), including
    a paragraph SPLIT across two pieces with different encodings
    (every paragraph > 48 chars) — the cross-piece assembly path;
  * a Prc (clxt 0x01) junk block ahead of the Pcdt, which readers
    must skip;
  * header/footer text planted AFTER ccpText in CP space — present in
    the piece table, structurally out of the main-document range;
  * HYPERLINK fields (0x13 instr 0x14 result 0x15) whose result text
    must count as link chars;
  * heading styles via a real STSH (with an EMPTY LPStd slot, which
    real Word files carry) + PlcfBtePapx -> PAPX FKP pages;
  * a stream under the mini-sector cutoff (the table stream) and one
    padded above it (WordDocument) — both FAT paths on every build.
"""

from __future__ import annotations

import struct

from toyocr_spark.extractor.cfb import CFB_MAGIC

_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_FREESECT = 0xFFFFFFFF
_NOSTREAM = 0xFFFFFFFF

_SS = 512  # v3 sector size
_MSS = 64  # mini sector size
_CUTOFF = 4096


# ---------------------------------------------------------------------------
# CFB container writer


def _dir_key(name: str) -> tuple[int, str]:
    """[MS-CFB] 2.6.4 name ordering: length first, then uppercase."""
    return (len(name), name.upper())


def _bst(order: list[int], links: dict[int, list[int]]) -> int:
    """Balanced BST over directory-entry indices (already name-sorted);
    fills links[i] = [left, right]; returns the subtree root index."""
    if not order:
        return _NOSTREAM
    mid = len(order) // 2
    root = order[mid]
    links[root][0] = _bst(order[:mid], links)
    links[root][1] = _bst(order[mid + 1 :], links)
    return root


def build_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """A version-3 compound file holding `streams` (name, bytes) under
    the root. Streams below the 4096-byte cutoff go through the
    ministream + miniFAT; larger ones chain through the main FAT."""
    # -- ministream / large-stream split ---------------------------------
    mini_data = bytearray()
    minifat: list[int] = []
    starts: dict[str, int] = {}
    large: list[str] = []
    for name, data in streams:
        if 0 < len(data) < _CUTOFF:
            first = len(mini_data) // _MSS
            n = -(-len(data) // _MSS)
            starts[name] = first
            minifat.extend(range(first + 1, first + n))
            minifat.append(_ENDOFCHAIN)
            mini_data += data.ljust(n * _MSS, b"\x00")
        else:
            large.append(name)
    mini_size = len(mini_data)

    # -- regular chains, laid in a fixed order ---------------------------
    n_entries = 1 + len(streams)
    nd = -(-(n_entries * 128) // _SS)
    minifat_blob = b"".join(struct.pack("<I", s) for s in minifat)
    minifat_blob = minifat_blob.ljust(-(-len(minifat_blob) // _SS) * _SS or 0, b"\xff")
    nm = len(minifat_blob) // _SS
    nms = -(-mini_size // _SS)
    data_by_name = dict(streams)
    nlarge = {n: -(-len(data_by_name[n]) // _SS) for n in large}
    total = nd + nm + nms + sum(nlarge.values())
    n_fat = 1
    while n_fat * (_SS // 4) < n_fat + total:
        n_fat += 1
    if n_fat > 109:
        raise ValueError("fixture CFB would need a DIFAT overflow")

    # sector ids: [FAT]*n_fat, directory, miniFAT, ministream, large...
    first_dir = n_fat
    first_minifat = first_dir + nd if nm else _ENDOFCHAIN
    first_mini = first_dir + nd + nm
    sec = first_mini + nms
    for name in large:
        starts[name] = sec
        sec += nlarge[name]

    fat: list[int] = [_FATSECT] * n_fat
    for count in (nd, nm, nms, *(nlarge[n] for n in large)):
        base = len(fat)
        fat.extend(list(range(base + 1, base + count)) + [_ENDOFCHAIN] if count else [])
    fat += [_FREESECT] * (n_fat * (_SS // 4) - len(fat))

    # -- directory --------------------------------------------------------
    names = [name for name, _ in streams]
    links = {i: [_NOSTREAM, _NOSTREAM] for i in range(n_entries)}
    order = sorted(range(1, n_entries), key=lambda i: _dir_key(names[i - 1]))
    child = _bst(order, links)

    def entry(name: str, typ: int, left: int, right: int, kid: int, start: int, size: int) -> bytes:
        raw = name.encode("utf-16-le")
        if len(raw) > 62:
            raise ValueError("CFB name too long")
        return (
            raw.ljust(64, b"\x00")
            + struct.pack("<HBB", len(raw) + 2, typ, 1)
            + struct.pack("<III", left, right, kid)
            + b"\x00" * 16  # CLSID
            + b"\x00" * 4  # state
            + b"\x00" * 16  # ctime/mtime
            + struct.pack("<IQ", start, size)
        )

    dirblob = entry(
        "Root Entry", 5, _NOSTREAM, _NOSTREAM, child,
        first_mini if mini_size else _ENDOFCHAIN, mini_size,
    )
    for i, (name, data) in enumerate(streams, start=1):
        dirblob += entry(
            name, 2, links[i][0], links[i][1], _NOSTREAM, starts[name], len(data)
        )
    dirblob = dirblob.ljust(nd * _SS, b"\x00")

    # -- header -----------------------------------------------------------
    hdr = bytearray(512)
    hdr[0:8] = CFB_MAGIC
    struct.pack_into("<HHHHH", hdr, 24, 0x003E, 0x0003, 0xFFFE, 9, 6)
    struct.pack_into("<IIIIIIII", hdr, 40, 0, n_fat, first_dir, 0, _CUTOFF,
                     first_minifat, nm, _ENDOFCHAIN)
    struct.pack_into("<I", hdr, 72, 0)
    for k in range(109):
        struct.pack_into("<I", hdr, 76 + 4 * k, k if k < n_fat else _FREESECT)

    body = bytearray()
    fatblob = b"".join(struct.pack("<I", v) for v in fat)
    body += fatblob
    body += dirblob
    body += minifat_blob
    body += bytes(mini_data).ljust(nms * _SS, b"\x00")
    for name in large:
        body += data_by_name[name].ljust(nlarge[name] * _SS, b"\x00")
    return bytes(hdr) + bytes(body)


# ---------------------------------------------------------------------------
# Word 97 binary builder


def para(
    text: str,
    style: str | None = None,
    link: str | None = None,
    unicode: bool | None = None,
    cell: bool = False,
) -> dict:
    """One paragraph spec. style='HeadingN' plants istd -> sti N via
    the STSH; link wraps the text in a HYPERLINK field (instr chars
    scanned-not-emitted, result chars = link chars); unicode forces
    the piece encoding (None = auto: cp1252 when encodable, with long
    paragraphs split into a cp1252 + UTF-16 piece pair); cell=True
    terminates with the 0x07 cell mark (table tag_path)."""
    return {"text": text, "style": style, "link": link, "unicode": unicode, "cell": cell}


_STIS: list[int | None] = [0, None] + list(range(1, 10))  # istd -> sti


def _istd_of(style: str | None) -> int:
    if not style:
        return 0
    if style.startswith("Heading"):
        n = int(style[7:])
        if 1 <= n <= 9:
            return n + 1  # the empty LPStd slot sits at istd 1
    raise ValueError(f"unknown style {style!r}")


def _encode_pieces(
    paras: list[dict], tail: list[str]
) -> tuple[bytes, list[tuple[int, int, int, bool]], list[tuple[int, int]], int]:
    """Lay the char stream as pieces at byte offset 1024. Returns
    (text_bytes, plcpcd pieces, [(fc_end_exclusive, istd)] per main
    paragraph, ccp_text). `tail` = subdocument texts (header/footer)
    appended after ccpText in CP space."""
    specs: list[tuple[str, bool | None]] = []
    para_char_lens: list[int] = []
    for p in paras:
        chars = p["text"]
        if p["link"] is not None:
            chars = "\x13" + f'HYPERLINK "{p["link"]}"' + "\x14" + chars + "\x15"
        chars += "\x07" if p["cell"] else "\r"
        para_char_lens.append(len(chars))
        if len(chars) > 48 and p["unicode"] is None:
            specs.append((chars[:24], None))
            specs.append((chars[24:], True))
        else:
            specs.append((chars, p["unicode"]))
    ccp_text = sum(para_char_lens)
    for t in tail:
        specs.append((t + "\r", None))

    buf = bytearray()
    pieces: list[tuple[int, int, int, bool]] = []
    cp = 0
    for chars, forced in specs:
        if forced is True:
            comp = False
        else:
            try:
                raw = chars.encode("cp1252")
                comp = True
            except UnicodeEncodeError:
                if forced is False:
                    raise
                comp = False
        if not comp:
            raw = chars.encode("utf-16-le")
        pieces.append((cp, cp + len(chars), 1024 + len(buf), comp))
        buf += raw
        cp += len(chars)

    def fc_past(cp_end: int) -> int:
        for cp0, cp1, off, comp in pieces:
            if cp0 < cp_end <= cp1:
                return off + (cp_end - cp0) * (1 if comp else 2)
        raise AssertionError("cp out of piece range")

    ends: list[tuple[int, int]] = []
    acc = 0
    for p, n in zip(paras, para_char_lens):
        acc += n
        ends.append((fc_past(acc), _istd_of(p["style"])))
    return bytes(buf), pieces, ends, ccp_text


def _fkp_pages(
    ends: list[tuple[int, int]], first_pn: int
) -> tuple[bytes, bytes]:
    """PAPX FKP pages (512 each) + the PlcfBtePapx that binds them.
    Chunks of <= 8 paragraphs per page."""
    pages = bytearray()
    afc: list[int] = [1024]
    pns: list[int] = []
    for c0 in range(0, len(ends), 8):
        chunk = ends[c0 : c0 + 8]
        crun = len(chunk)
        page = bytearray(512)
        page[511] = crun
        rgfc = [1024 if c0 == 0 else ends[c0 - 1][0]] + [e[0] for e in chunk]
        for j, fc in enumerate(rgfc):
            struct.pack_into("<I", page, 4 * j, fc)
        papx_base = (511 - 4 * crun) & ~1
        for j, (_fc, istd) in enumerate(chunk):
            po = papx_base + 4 * j
            page[po] = 1  # cb: one word of grpprl = the istd alone
            struct.pack_into("<H", page, po + 1, istd)
            bx_off = 4 * (crun + 1) + 13 * j
            page[bx_off] = po // 2
        if 4 * (crun + 1) + 13 * crun > papx_base:
            raise AssertionError("FKP page overflow")
        pages += page
        afc.append(chunk[-1][0])
        pns.append(first_pn + c0 // 8)
    plc = b"".join(struct.pack("<I", v) for v in afc)
    plc += b"".join(struct.pack("<I", p) for p in pns)
    return bytes(pages), plc


def _stsh() -> bytes:
    stshi = struct.pack("<H", len(_STIS)) + b"\x00" * 16
    blob = struct.pack("<H", len(stshi)) + stshi
    for sti in _STIS:
        if sti is None:
            blob += struct.pack("<H", 0)  # empty LPStd slot
        else:
            blob += struct.pack("<HH", 8, sti) + b"\x00" * 6
    return blob


def _clx(pieces: list[tuple[int, int, int, bool]], prc_junk: bool) -> bytes:
    cps = [p[0] for p in pieces] + [pieces[-1][1]]
    plc = b"".join(struct.pack("<I", v) for v in cps)
    for _cp0, _cp1, off, comp in pieces:
        fc_raw = (off * 2) | 0x40000000 if comp else off
        plc += struct.pack("<HIH", 0, fc_raw, 0)
    out = b""
    if prc_junk:
        out += b"\x01" + struct.pack("<H", 4) + b"\x00\x01\x02\x03"
    return out + b"\x02" + struct.pack("<I", len(plc)) + plc


def _fib(
    table_1: bool, ccp_text: int, cb_mac: int,
    stsh: tuple[int, int], papx: tuple[int, int], clx: tuple[int, int],
) -> bytes:
    fib = bytearray(154 + 93 * 8)
    struct.pack_into("<HH", fib, 0, 0xA5EC, 0x00C1)
    struct.pack_into("<H", fib, 0x0A, 0x0200 if table_1 else 0)
    struct.pack_into("<H", fib, 32, 14)  # csw
    struct.pack_into("<H", fib, 62, 22)  # cslw
    struct.pack_into("<I", fib, 64, cb_mac)
    struct.pack_into("<I", fib, 76, ccp_text)
    struct.pack_into("<H", fib, 152, 93)  # cbRgFcLcb, the Word-97 count

    def pair(i: int, fc: int, lcb: int) -> None:
        struct.pack_into("<II", fib, 154 + 8 * i, fc, lcb)

    pair(1, *stsh)
    pair(13, *papx)
    pair(33, *clx)
    return bytes(fib)


def build_doc(
    paragraphs: list[dict | str],
    header_text: str | None = None,
    footer_text: str | None = None,
    table_name: str = "1Table",
    prc_junk: bool = True,
) -> bytes:
    """Assemble a .doc: paragraphs = para() specs (plain strings get
    default specs); header/footer text is planted AFTER ccpText in CP
    space — present in the piece table, structurally outside the
    main-document range the tokenizer emits."""
    paras = [p if isinstance(p, dict) else para(p) for p in paragraphs]
    if not paras:
        raise ValueError("a .doc fixture needs at least one paragraph")
    tail = [t for t in (header_text, footer_text) if t is not None]
    text, pieces, ends, ccp_text = _encode_pieces(paras, tail)

    word = bytearray()
    word += b"\x00" * 1024  # FIB placeholder, padded to the text start
    word += text
    cb_mac = len(word)
    word += b"\x00" * (-len(word) % 512)
    first_pn = len(word) // 512
    fkp, papx_plc = _fkp_pages(ends, first_pn)
    word += fkp
    if len(word) < _CUTOFF:
        word += b"\x00" * (_CUTOFF - len(word))  # force the main-FAT path

    stsh = _stsh()
    clx = _clx(pieces, prc_junk)
    table = stsh + papx_plc + clx
    fib = _fib(
        table_name == "1Table", ccp_text, cb_mac,
        (0, len(stsh)), (len(stsh), len(papx_plc)),
        (len(stsh) + len(papx_plc), len(clx)),
    )
    word[: len(fib)] = fib
    return build_cfb([("WordDocument", bytes(word)), (table_name, table)])

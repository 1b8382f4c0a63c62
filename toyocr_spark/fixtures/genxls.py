"""Deterministic legacy Excel (.xls / BIFF8) fixture builder — the
binary twin of fixtures/genxlsx.py: a real Workbook stream (globals
substream with SST + BOUNDSHEETs, one substream per sheet with
LABELSST / NUMBER / RK / MULRK cell records) inside a real compound
file (fixtures/gendoc.build_cfb), so extractor/xls.py is tested
against containers any conformant BIFF reader opens.

What the builder deliberately exercises:
  * shared-string indirection (every str cell is an SST index — the
    format's distinctive wrinkle, same as xlsx's sharedStrings);
  * BOTH SST encodings (compressed latin-1 and UTF-16), chosen per
    string by content;
  * an optional CONTINUE split INSIDE a string's character run, with
    the continuation's fresh flags byte — including the pathological
    encoding FLIP mid-string (compressed first half, UTF-16 second);
  * the packed RK forms (30-bit integer and x100) plus MULRK runs for
    consecutive integer cells, NUMBER doubles for everything else.

Determinism: pure function of the inputs, fixed record order —
identical bytes for identical inputs on every host."""

from __future__ import annotations

import struct

from toyocr_spark.fixtures.gendoc import build_cfb


def _rec(typ: int, payload: bytes) -> bytes:
    return struct.pack("<HH", typ, len(payload)) + payload


def _bof(dt: int) -> bytes:
    # BIFF8 version 0x0600; build/year/flags pinned to constants
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def _can_compress(s: str) -> bool:
    return all(ord(c) < 0x100 for c in s)


def _xl_string(s: str) -> bytes:
    """XLUnicodeRichExtendedString, no rich/ext trailers."""
    if _can_compress(s):
        return struct.pack("<HB", len(s), 0x00) + s.encode("latin-1")
    return struct.pack("<HB", len(s), 0x01) + s.encode("utf-16-le")


def _sst_records(strings: list[str], total_refs: int, continue_split: bool) -> bytes:
    """The SST record, optionally splitting the FIRST splittable
    string's character run into a CONTINUE whose fresh flags byte
    flips the encoding to UTF-16 (the hardest legal shape)."""
    head = struct.pack("<II", total_refs, len(strings))
    if not continue_split:
        body = b"".join(_xl_string(s) for s in strings)
        return _rec(0x00FC, head + body)
    split_at = next(
        (i for i, s in enumerate(strings) if len(s) >= 2 and _can_compress(s)),
        None,
    )
    if split_at is None:
        body = b"".join(_xl_string(s) for s in strings)
        return _rec(0x00FC, head + body)
    first = head + b"".join(_xl_string(s) for s in strings[:split_at])
    s = strings[split_at]
    cut = len(s) // 2
    # header + first half compressed, run continues in the CONTINUE
    first += struct.pack("<HB", len(s), 0x00) + s[:cut].encode("latin-1")
    # continuation: fresh flags byte = 0x01 -> remainder is UTF-16
    cont = b"\x01" + s[cut:].encode("utf-16-le")
    cont += b"".join(_xl_string(x) for x in strings[split_at + 1 :])
    return _rec(0x00FC, first) + _rec(0x003C, cont)


def _rk_int(n: int) -> int | None:
    if -(2**29) <= n < 2**29:
        return ((n << 2) & 0xFFFFFFFF) | 2
    return None


def _sheet_substream(rows: list[list[object]], sst_index: dict[str, int]) -> bytes:
    out = bytearray(_bof(0x0010))
    for rw, row in enumerate(rows):
        col = 0
        while col < len(row):
            cell = row[col]
            if cell is None or cell == "":
                col += 1
                continue
            if isinstance(cell, str):
                out += _rec(
                    0x00FD, struct.pack("<HHHI", rw, col, 15, sst_index[cell])
                )
                col += 1
                continue
            # numeric: gather a run of RK-able ints for MULRK
            run: list[int] = []
            c = col
            while c < len(row) and isinstance(row[c], int) and _rk_int(row[c]) is not None:
                run.append(_rk_int(row[c]))  # type: ignore[arg-type]
                c += 1
            if len(run) >= 2:
                body = struct.pack("<HH", rw, col)
                for v in run:
                    body += struct.pack("<HI", 15, v)
                body += struct.pack("<H", col + len(run) - 1)
                out += _rec(0x00BD, body)
                col = c
            elif len(run) == 1:
                out += _rec(0x027E, struct.pack("<HHHI", rw, col, 15, run[0]))
                col += 1
            else:  # float or out-of-range int -> NUMBER
                out += _rec(
                    0x0203, struct.pack("<HHHd", rw, col, 15, float(cell))
                )
                col += 1
    out += _rec(0x000A, b"")
    return bytes(out)


def build_xls(
    sheets: dict[str, list[list[object]]],
    continue_split: bool = False,
) -> bytes:
    """Assemble a .xls: sheets = {name: rows}, each cell str | int |
    float | None. continue_split plants an SST CONTINUE boundary
    inside a string with an encoding flip."""
    strings: list[str] = []
    seen: dict[str, int] = {}
    total_refs = 0
    for rows in sheets.values():
        for row in rows:
            for cell in row:
                if isinstance(cell, str) and cell:
                    total_refs += 1
                    if cell not in seen:
                        seen[cell] = len(strings)
                        strings.append(cell)

    subs = [_sheet_substream(rows, seen) for rows in sheets.values()]
    sst = _sst_records(strings, total_refs, continue_split)

    # globals substream size depends on BOUNDSHEET count only (fixed
    # 12-byte payloads: lbPlyPos, grbit, 1-byte-len compressed name)
    def boundsheet(pos: int, name: str) -> bytes:
        nm = name[:8].encode("latin-1", "replace")
        return _rec(0x0085, struct.pack("<IHB B", pos, 0, len(nm), 0) + nm)

    names = list(sheets)
    globals_len = len(_bof(0x0005)) + len(sst) + sum(
        len(boundsheet(0, n)) for n in names
    ) + 4  # EOF
    positions: list[int] = []
    pos = globals_len
    for sub in subs:
        positions.append(pos)
        pos += len(sub)
    stream = bytearray(_bof(0x0005))
    stream += sst
    for p, n in zip(positions, names):
        stream += boundsheet(p, n)
    stream += _rec(0x000A, b"")
    assert len(stream) == globals_len
    for sub in subs:
        stream += sub
    return build_cfb([("Workbook", bytes(stream))])

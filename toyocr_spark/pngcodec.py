"""Pure-stdlib PNG codec: full scanline UNFILTERING (spec §9 filter
types 0-4: None/Sub/Up/Average/Paeth) on top of the chunk walk that
``multimodal._parse_png`` already does, plus a fixture encoder that
applies real per-row filters so round-trip tests exercise every type.

Layering (mirrors gifcodec/jpegcodec): ``multimodal._parse_png`` stays
the metadata+stream leg (q26's contract: inflated filtered scanline
stream); ``decode_png`` here is the pixel leg — the raster a downstream
perceptual-hash / feature-extract operator consumes. Deterministic,
no PIL, no CRC validation (decode, don't verify).

Scope: 8-bit samples, non-interlaced (Adam7 raises — the fixture
families are non-interlaced; GIF covers the interlace axis with a real
four-pass deinterlacer). Reference analogue: the dataset mapper decodes
image bytes to pixel arrays before augmentation
(reference data/dataset_mapper.py:151-155).
"""

from __future__ import annotations

import struct
import zlib

MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (spec §11.2.2)
CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_COLOR_TYPE_FOR = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (spec §9.4): nearest of left/up/up-left to the
    linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def unfilter(stream: bytes, width: int, height: int, channels: int) -> bytes:
    """Invert the per-scanline filters of an inflated IDAT stream:
    each scanline is 1 filter-type byte + width*channels sample bytes
    (8-bit depth). Returns the raw raster, row-major, ``channels``
    bytes per pixel. Raises ValueError on short streams or unknown
    filter types (determinism guard — garbage never loops)."""
    bpp = channels  # bytes per complete pixel at 8-bit depth
    rowlen = width * bpp
    need = height * (1 + rowlen)
    if len(stream) < need:
        raise ValueError(f"PNG stream short: {len(stream)} < {need}")
    out = bytearray(height * rowlen)
    prev_off = -1  # previous row offset in out, -1 = none
    pos = 0
    for y in range(height):
        ft = stream[pos]
        pos += 1
        row = stream[pos : pos + rowlen]
        pos += rowlen
        off = y * rowlen
        if ft == 0:  # None
            out[off : off + rowlen] = row
        elif ft == 1:  # Sub
            for i in range(rowlen):
                a = out[off + i - bpp] if i >= bpp else 0
                out[off + i] = (row[i] + a) & 0xFF
        elif ft == 2:  # Up
            if prev_off < 0:
                out[off : off + rowlen] = row
            else:
                for i in range(rowlen):
                    out[off + i] = (row[i] + out[prev_off + i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                a = out[off + i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if prev_off >= 0 else 0
                out[off + i] = (row[i] + ((a + b) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = out[off + i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if prev_off >= 0 else 0
                c = out[prev_off + i - bpp] if (prev_off >= 0 and i >= bpp) else 0
                out[off + i] = (row[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ft} at row {y}")
        prev_off = off
    return bytes(out)


# Adam7 pass grid: (x0, y0, dx, dy) per pass (spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_dims(width: int, height: int) -> list[tuple[int, int, int, int, int, int]]:
    """(x0, y0, dx, dy, pass_w, pass_h) for each non-empty Adam7 pass."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            out.append((x0, y0, dx, dy, pw, ph))
    return out


def _decode_adam7(stream: bytes, width: int, height: int, channels: int) -> bytes:
    """Seven-pass interlaced decode: each pass is an independently
    filtered sub-image (its own filter-byte column, its own 'previous
    row' chain), unfiltered then scattered onto the pass grid."""
    bpp = channels
    out = bytearray(width * height * bpp)
    pos = 0
    for x0, y0, dx, dy, pw, ph in _adam7_dims(width, height):
        sub_len = ph * (1 + pw * bpp)
        sub = unfilter(stream[pos : pos + sub_len], pw, ph, channels)
        pos += sub_len
        for j in range(ph):
            y = y0 + j * dy
            for i in range(pw):
                x = x0 + i * dx
                src = (j * pw + i) * bpp
                dst = (y * width + x) * bpp
                out[dst : dst + bpp] = sub[src : src + bpp]
    return bytes(out)


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """payload -> (width, height, channels, raster): the full pixel
    decode — chunk walk, IDAT inflate, scanline unfilter, Adam7
    deinterlace when the IHDR says so. 8-bit depth only (other depths
    raise ValueError: a documented seam, not silent corruption)."""
    if len(payload) < 33 or payload[:8] != MAGIC or payload[12:16] != b"IHDR":
        raise ValueError("not a PNG with leading IHDR")
    width, height = struct.unpack(">II", payload[16:24])
    depth, color_type, _comp, _filt, interlace = payload[24:29]
    chans = CHANNELS.get(color_type)
    if chans is None:
        raise ValueError(f"PNG color type {color_type}")
    if depth != 8:
        raise ValueError(f"PNG bit depth {depth} (only 8 supported)")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace}")
    if width == 0 or height == 0 or width * height > 1 << 26:
        raise ValueError(f"PNG dims {width}x{height} out of bounds")
    pos, idat = 8, []
    n = len(payload)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        if typ == b"IDAT":
            idat.append(payload[pos + 8 : pos + 8 + ln])
        if typ == b"IEND":
            break
        pos += 12 + ln
    stream = zlib.decompress(b"".join(idat))
    if interlace == 1:
        return width, height, chans, _decode_adam7(stream, width, height, chans)
    return width, height, chans, unfilter(stream, width, height, chans)


# ------------------------------------------------------------- encoder


def _filter_row(ft: int, row: bytes, prev: bytes | None, bpp: int) -> bytes:
    """Apply filter ``ft`` to one raw scanline (the encoder side of
    ``unfilter`` — exact inverse by construction of the spec formulas)."""
    n = len(row)
    out = bytearray(n)
    if ft == 0:
        return bytes(row)
    for i in range(n):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i] if prev is not None else 0
        c = prev[i - bpp] if (prev is not None and i >= bpp) else 0
        if ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) >> 1
        elif ft == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"filter type {ft}")
        out[i] = (row[i] - pred) & 0xFF
    return bytes(out)


def text_chunks(payload: bytes) -> list[tuple[str, str]]:
    """(keyword, text) pairs from every tEXt chunk (spec §11.3.4:
    Latin-1 keyword, NUL separator, Latin-1 text) — the image-metadata
    mining leg (title / author / description / copyright live here).
    Unknown or malformed chunks are skipped, never fatal: metadata
    harvest must not reject an image the pixel decoder accepts."""
    if len(payload) < 8 or payload[:8] != MAGIC:
        raise ValueError("not a PNG")
    out = []
    pos, n = 8, len(payload)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        if typ == b"tEXt":
            data = payload[pos + 8 : pos + 8 + ln]
            sep = data.find(b"\0")
            if 0 < sep < 80:  # spec: keyword 1-79 bytes
                out.append(
                    (
                        data[:sep].decode("latin-1"),
                        data[sep + 1 :].decode("latin-1"),
                    )
                )
        if typ == b"IEND":
            break
        pos += 12 + ln
    return out


def encode_png(
    raster: bytes,
    width: int,
    height: int,
    channels: int,
    row_filter=None,
    interlace: bool = False,
    texts: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble a spec-conformant PNG (CRCs included) from a raw 8-bit
    raster. ``row_filter(y) -> 0..4`` picks each scanline's filter —
    default cycles through all five types so a decode round-trip proves
    every unfilter branch. ``interlace=True`` emits the seven Adam7
    sub-images (each filtered independently, per spec §8.2). Fixture-
    grade (like encode_gif / encode_baseline): deterministic bytes for
    deterministic input."""
    bpp = channels
    rowlen = width * bpp
    if len(raster) != height * rowlen:
        raise ValueError(f"raster size {len(raster)} != {height}x{rowlen}")
    color_type = _COLOR_TYPE_FOR[channels]
    pick = row_filter if row_filter is not None else (lambda y: y % 5)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def filtered_lines(rows: list[bytes]) -> list[bytes]:
        lines, prev = [], None
        for y, row in enumerate(rows):
            ft = int(pick(y)) % 5
            lines.append(bytes([ft]) + _filter_row(ft, row, prev, bpp))
            prev = row
        return lines

    if interlace:
        lines = []
        for x0, y0, dx, dy, pw, ph in _adam7_dims(width, height):
            rows = []
            for j in range(ph):
                y = y0 + j * dy
                row = bytearray(pw * bpp)
                for i in range(pw):
                    src = (y * width + (x0 + i * dx)) * bpp
                    row[i * bpp : (i + 1) * bpp] = raster[src : src + bpp]
                rows.append(bytes(row))
            lines.extend(filtered_lines(rows))
    else:
        lines = filtered_lines(
            [raster[y * rowlen : (y + 1) * rowlen] for y in range(height)]
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, color_type, 0, 0, 1 if interlace else 0
    )
    comp = zlib.compress(b"".join(lines), 6)
    text = b"".join(
        chunk(b"tEXt", k.encode("latin-1") + b"\0" + v.encode("latin-1"))
        for k, v in (texts or [])
    )
    return MAGIC + chunk(b"IHDR", ihdr) + text + chunk(b"IDAT", comp) + chunk(b"IEND", b"")

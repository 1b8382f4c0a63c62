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
    """Invert the per-scanline filters of an inflated IDAT stream at
    8-bit depth: each scanline is 1 filter-type byte + width*channels
    sample bytes. Returns the raw raster, row-major, ``channels``
    bytes per pixel. (Thin wrapper over ``_unfilter_raw``, which also
    serves the 1/2/4/16-bit paths with their byte-packed strides.)"""
    return _unfilter_raw(stream, width * channels, height, channels)


def _unfilter_raw(stream: bytes, rowlen: int, height: int, bpp: int) -> bytes:
    """Core scanline unfilter over raw byte geometry: ``rowlen`` data
    bytes per scanline, filters correlating at a ``bpp``-byte stride
    (spec: bpp = ceil(depth * channels / 8), floored to 1 for sub-byte
    depths). Raises ValueError on short streams or unknown filter
    types (determinism guard — garbage never loops)."""
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


def _decode_rows(
    stream: bytes,
    pos: int,
    width: int,
    height: int,
    channels: int,
    depth: int,
    scale_gray: bool,
) -> tuple[bytes, int]:
    """Unfilter + unpack one (sub-)image starting at ``pos`` of the
    inflated stream -> (raster at ONE byte per sample, new pos).

    depth 8: passthrough. depth 16: high byte (the spec-sanctioned
    8-bit rendering of 16-bit samples). depths 1/2/4: MSB-first bit
    unpack per scanline (rows are bit-padded to a byte boundary);
    grayscale samples scale to full 8-bit range (v * 255 / (2^d - 1)),
    palette INDICES stay raw (they index PLTE, scaling would corrupt
    them — ``scale_gray`` distinguishes the two)."""
    if depth == 8:
        rowlen, bpp = width * channels, channels
    elif depth == 16:
        rowlen, bpp = width * channels * 2, channels * 2
    else:  # 1, 2, 4
        rowlen, bpp = (width * channels * depth + 7) // 8, 1
    need = height * (1 + rowlen)
    raw = _unfilter_raw(stream[pos : pos + need], rowlen, height, bpp)
    pos += need
    if depth == 8:
        return raw, pos
    if depth == 16:
        return raw[0::2], pos  # big-endian sample pairs -> high bytes
    spr = width * channels  # samples per row
    maxval = (1 << depth) - 1
    out = bytearray(height * spr)
    mask = maxval
    for y in range(height):
        row = raw[y * rowlen : (y + 1) * rowlen]
        o = y * spr
        for i in range(spr):
            bit = i * depth
            v = (row[bit >> 3] >> (8 - depth - (bit & 7))) & mask
            out[o + i] = v * 255 // maxval if scale_gray else v
    return bytes(out), pos


def _decode_adam7(
    stream: bytes, width: int, height: int, channels: int, depth: int, scale_gray: bool
) -> bytes:
    """Seven-pass interlaced decode: each pass is an independently
    filtered sub-image (its own filter-byte column, its own 'previous
    row' chain), unfiltered then scattered onto the pass grid."""
    bpp = channels  # one byte per sample after _decode_rows
    out = bytearray(width * height * bpp)
    pos = 0
    for x0, y0, dx, dy, pw, ph in _adam7_dims(width, height):
        sub, pos = _decode_rows(stream, pos, pw, ph, channels, depth, scale_gray)
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
    deinterlace when the IHDR says so, EVERY spec bit depth. The
    raster is always one byte per sample: 16-bit samples render as
    their high byte (the spec-sanctioned 8-bit reduction), 1/2/4-bit
    grayscale scales to the full 0-255 range, 1/2/4-bit palette
    indices stay raw (they index PLTE)."""
    if len(payload) < 33 or payload[:8] != MAGIC or payload[12:16] != b"IHDR":
        raise ValueError("not a PNG with leading IHDR")
    width, height = struct.unpack(">II", payload[16:24])
    depth, color_type, _comp, _filt, interlace = payload[24:29]
    chans = CHANNELS.get(color_type)
    if chans is None:
        raise ValueError(f"PNG color type {color_type}")
    # spec §11.2.2 legal (depth, color type) combinations
    _legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
    if depth not in _legal[color_type]:
        raise ValueError(f"PNG bit depth {depth} illegal for color type {color_type}")
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
    # inflate EXACTLY the bytes the validated IHDR geometry calls for
    # (filter byte + packed scanline per row, per Adam7 pass when
    # interlaced): a hostile zip-bomb IDAT on a small declared image
    # must not allocate beyond the declared raster on a worker
    if interlace == 1:
        need = sum(
            ph * (1 + (pw * chans * depth + 7) // 8)
            for _x0, _y0, _dx, _dy, pw, ph in _adam7_dims(width, height)
        )
    else:
        need = height * (1 + (width * chans * depth + 7) // 8)
    stream = zlib.decompressobj().decompress(b"".join(idat), need)
    scale_gray = color_type != 3  # palette indices must stay raw
    if interlace == 1:
        raster = _decode_adam7(stream, width, height, chans, depth, scale_gray)
    else:
        raster, _ = _decode_rows(stream, 0, width, height, chans, depth, scale_gray)
    return width, height, chans, raster


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
    depth: int = 8,
) -> bytes:
    """Assemble a spec-conformant PNG (CRCs included) from a raw 8-bit
    raster. ``row_filter(y) -> 0..4`` picks each scanline's filter —
    default cycles through all five types so a decode round-trip proves
    every unfilter branch. ``interlace=True`` emits the seven Adam7
    sub-images (each filtered independently, per spec §8.2). Fixture-
    grade (like encode_gif / encode_baseline): deterministic bytes for
    deterministic input.

    ``depth``: 8 (default) writes samples as-is. 16 writes each input
    sample v as the big-endian pair (v, v) = v*257 — the exact 16-bit
    expansion of an 8-bit value, so decode's high-byte reduction
    round-trips. 1/2/4 (grayscale only) bit-pack RAW samples (each
    input byte must be < 2**depth); decode returns them scaled to
    0-255, i.e. v * 255 // (2**depth - 1)."""
    spr = width * channels  # samples per row (input raster: 1 byte each)
    if len(raster) != height * spr:
        raise ValueError(f"raster size {len(raster)} != {height}x{spr}")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"bit depth {depth}")
    if depth < 8:
        if channels != 1:
            raise ValueError("sub-byte depths are grayscale-only here")
        if any(v >= 1 << depth for v in raster):
            raise ValueError(f"sample out of range for depth {depth}")
    color_type = _COLOR_TYPE_FOR[channels]
    pick = row_filter if row_filter is not None else (lambda y: y % 5)

    def pack_row(samples: bytes) -> bytes:
        if depth == 8:
            return samples
        if depth == 16:
            return b"".join(bytes((v, v)) for v in samples)
        out = bytearray((len(samples) * depth + 7) // 8)
        for i, v in enumerate(samples):
            bit = i * depth
            out[bit >> 3] |= v << (8 - depth - (bit & 7))
        return bytes(out)

    bpp = channels * 2 if depth == 16 else (channels if depth == 8 else 1)

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
                row = bytearray(pw * channels)
                for i in range(pw):
                    src = (y * width + (x0 + i * dx)) * channels
                    row[i * channels : (i + 1) * channels] = raster[src : src + channels]
                rows.append(pack_row(bytes(row)))
            lines.extend(filtered_lines(rows))
    else:
        lines = filtered_lines(
            [pack_row(raster[y * spr : (y + 1) * spr]) for y in range(height)]
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, 1 if interlace else 0
    )
    comp = zlib.compress(b"".join(lines), 6)
    text = b"".join(
        chunk(b"tEXt", k.encode("latin-1") + b"\0" + v.encode("latin-1"))
        for k, v in (texts or [])
    )
    return MAGIC + chunk(b"IHDR", ihdr) + text + chunk(b"IDAT", comp) + chunk(b"IEND", b"")

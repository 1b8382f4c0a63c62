"""Pure-stdlib GIF codec: a real LZW pixel decoder (and a minimal
encoder used by the fixtures/tests — no PIL in this container).

Decoder scope (``decode_gif``): GIF87a/GIF89a, global color table,
one image block, variable-width LZW (dictionary growth to 12 bits,
clear-code resets, deferred clear), sub-block reassembly, and the
four-pass interlace scheme (spec Appendix E) — the decoded output is
always the natural row-major index raster plus the palette, i.e.
genuinely decoded pixels, the same contract as the PNG/JPEG legs.
Extension blocks (graphic control, comment, application) are walked
and skipped; local color tables override the global one. Raises
``ValueError`` on files without an image block or with a corrupt LZW
stream.

Everything is integer-exact and deterministic: the same payload
decodes to the same index raster on any worker, so cross-engine
fingerprints are stable. Reference analogue: the image bytes -> array
decode at the start of the per-record map
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations

import struct

#: interlace passes: (first row, row step) per spec Appendix E
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODE_WIDTH = 12


def _interlace_rows(height: int) -> list[int]:
    """Row output order for an interlaced image of ``height`` rows."""
    rows: list[int] = []
    for first, step in _INTERLACE_PASSES:
        rows.extend(range(first, height, step))
    return rows


# ------------------------------------------------------------------ encode


def _lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emit CLEAR, then codes with little-endian bit
    packing, widening at 2^width and resetting the dictionary when it
    reaches 4096 entries; terminated by EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    put(clear, width)
    prefix = b""
    for b in indices:
        trial = prefix + bytes((b,))
        if trial in table:
            prefix = trial
            continue
        put(table[prefix], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[trial] = next_code
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            next_code += 1
        else:  # dictionary full: reset, like real encoders do
            put(clear, width)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes((b,))
    if prefix:
        put(table[prefix], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    indices: bytes,
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    interlace: bool = False,
) -> bytes:
    """Minimal single-image GIF89a writer: global color table padded to
    a power of two, real LZW-compressed index data in <=255-byte
    sub-blocks, optional interlaced row order. Deterministic bytes for
    identical inputs — the raster twin of fixtures/genpdf."""
    if len(indices) != width * height:
        raise ValueError("index raster does not match dimensions")
    n_pal = max(2, len(palette))
    gct_bits = max(1, (n_pal - 1).bit_length())
    n_slots = 1 << gct_bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | 0x70 | (gct_bits - 1))  # GCT present, 8-bit res
    out += b"\x00\x00"  # background index, aspect
    for i in range(n_slots):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    out.append(0x2C)  # image descriptor
    out += struct.pack("<HHHH", 0, 0, width, height)
    out.append(0x40 if interlace else 0x00)
    if interlace:
        rows = _interlace_rows(height)
        indices = b"".join(
            indices[r * width : (r + 1) * width] for r in rows
        )
    min_code_size = max(2, gct_bits)
    out.append(min_code_size)
    data = _lzw_compress(indices, min_code_size)
    for pos in range(0, len(data), 255):
        block = data[pos : pos + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


# ------------------------------------------------------------------ decode


def _lzw_decompress(data: bytes, min_code_size: int, expect: int) -> bytes:
    """Inverse of _lzw_compress; stops at EOI or after ``expect``
    pixels (some writers omit the trailing EOI)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: list[bytes] = [bytes((i,)) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < expect:
        while nbits < width:
            if pos >= n:
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes((i,)) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    if len(out) < expect:
        raise ValueError("LZW stream ended before the raster was full")
    return bytes(out[:expect])


def decode_gif(payload: bytes) -> tuple[int, int, bytes, bytes]:
    """payload -> (width, height, palette_rgb, index_raster): REAL LZW
    decode of the first image block, deinterlaced to natural row-major
    order. ``palette_rgb`` is the effective color table (local if the
    image has one, else global); ``index_raster`` has one byte per
    pixel, width*height long."""
    if payload[:4] != b"GIF8" or len(payload) < 13:
        raise ValueError("not a GIF file")
    flags = payload[10]
    pos = 13
    gct = b""
    if flags & 0x80:
        n_slots = 2 << (flags & 0x07)
        gct = payload[pos : pos + 3 * n_slots]
        pos += 3 * n_slots
    n = len(payload)
    while pos < n:
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < n and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            width, height = struct.unpack("<HH", payload[pos + 5 : pos + 9])
            img_flags = payload[pos + 9]
            pos += 10
            pal = gct
            if img_flags & 0x80:  # local color table
                n_slots = 2 << (img_flags & 0x07)
                pal = payload[pos : pos + 3 * n_slots]
                pos += 3 * n_slots
            min_code_size = payload[pos]
            pos += 1
            chunks = []
            while pos < n and payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            raster = _lzw_decompress(
                b"".join(chunks), min_code_size, width * height
            )
            if img_flags & 0x40:  # interlaced: restore natural order
                natural = bytearray(len(raster))
                for stored, row in enumerate(_interlace_rows(height)):
                    natural[row * width : (row + 1) * width] = raster[
                        stored * width : (stored + 1) * width
                    ]
                raster = bytes(natural)
            return width, height, pal, raster
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF without an image block")

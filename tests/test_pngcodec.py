"""PNG unfilter codec + image dHash: round-trip across all five filter
types, hand-computed known-answer vectors (so an encoder bug cannot
cancel a decoder bug), fuzz determinism, and the dHash invariances the
near-dup join relies on (global brightness; single-cell perturbation
=> hamming <= 1)."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from toyocr_spark.pngcodec import decode_png, encode_png, unfilter


def _ramp(w: int, h: int, ch: int) -> bytes:
    return bytes((x * 31 + y * 57 + c * 11) % 256 for y in range(h) for x in range(w) for c in range(ch))


@pytest.mark.parametrize("dims", [(9, 7, 1), (8, 8, 3), (1, 5, 1), (16, 3, 3), (5, 1, 2), (4, 6, 4)])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, None])
def test_roundtrip_every_filter(dims, ft):
    w, h, ch = dims
    raster = _ramp(w, h, ch)
    rf = (lambda y: ft) if ft is not None else None  # None => cycle 0..4
    assert decode_png(encode_png(raster, w, h, ch, row_filter=rf)) == (w, h, ch, raster)


def test_unfilter_known_vectors():
    """Decoder-only known answers, worked by hand from spec §9 formulas
    (independent of the encoder): 3px 1ch rows through Sub, Up,
    Average, Paeth."""
    # row0 Sub: raw = cumulative sums 10, 10+5=15, 15+250=265&255=9
    # row1 Up:  raw = prev + delta = 11, 17, 12
    # row2 Avg: raw[i] = delta + (left + up)//2 -> 1+(0+11)//2=6,
    #           2+(6+17)//2=13, 3+(13+12)//2=15
    # row3 Paeth: a=left, b=up, c=up-left; p0: pred=b=6 -> 7;
    #           p1: a=7,b=13,c=6 -> p=14, pa=7,pb=1,pc=8 -> pred=13 -> 15;
    #           p2: a=15,b=15,c=13 -> p=17, pa=2,pb=2,pc=4 -> pred=a=15 -> 16
    stream = bytes(
        [1, 10, 5, 250]
        + [2, 1, 2, 3]
        + [3, 1, 2, 3]
        + [4, 1, 2, 1]
    )
    assert unfilter(stream, 3, 4, 1) == bytes([10, 15, 9, 11, 17, 12, 6, 13, 15, 7, 15, 16])


def test_unfilter_bpp_respects_channels():
    """Sub's 'left' neighbour is bpp bytes back, not 1: a 2px 3ch row
    filtered with Sub must add pixel-sized strides."""
    # raw row: px0=(1,2,3) px1=(5,7,9); Sub deltas: 1,2,3, 4,5,6
    stream = bytes([1, 1, 2, 3, 4, 5, 6])
    assert unfilter(stream, 2, 1, 3) == bytes([1, 2, 3, 5, 7, 9])


def test_decode_rejects_unsupported():
    raster = _ramp(4, 4, 1)
    good = encode_png(raster, 4, 4, 1)
    with pytest.raises(ValueError):
        decode_png(good[:20])
    # invalid interlace method (0 and 1 are the only spec values)
    bad = bytearray(good)
    bad[28] = 2
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # bogus filter type inside the stream
    with pytest.raises(ValueError):
        unfilter(bytes([9, 0, 0, 0]), 3, 1, 1)
    # short stream
    with pytest.raises(ValueError):
        unfilter(bytes([0, 0]), 3, 1, 1)


def test_decoder_fuzz_deterministic_and_bounded():
    """Bit-flipped PNGs either decode or raise — never hang or decode
    nondeterministically (same discipline as the JPEG/GIF fuzz tests)."""
    rng = random.Random(31)
    base = encode_png(_ramp(17, 11, 3), 17, 11, 3)
    for _ in range(300):
        blob = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        payload = bytes(blob)
        try:
            first = decode_png(payload)
        except (ValueError, struct.error, IndexError, zlib.error, OverflowError, MemoryError):
            continue
        assert decode_png(payload) == first


def _dhash_of(raster: bytes, w: int, h: int) -> tuple[int, int, int, int]:
    """Reference dHash over a grayscale raster via the public operator
    path (single-row local Arrow batch is overkill; recompute with the
    same cell/compare rules inline)."""
    xs = [x * w // 8 for x in range(9)]
    ys = [y * h // 8 for y in range(9)]
    chunks = [0, 0, 0, 0]
    for cy in range(8):
        for cx in range(7):
            def cell(c):
                return (
                    sum(
                        raster[yy * w + xx]
                        for yy in range(ys[cy], ys[cy + 1])
                        for xx in range(xs[c], xs[c + 1])
                    ),
                    (ys[cy + 1] - ys[cy]) * (xs[c + 1] - xs[c]),
                )
            (sa, aa), (sb, ab) = cell(cx), cell(cx + 1)
            if sb * aa > sa * ab:
                j = cy * 7 + cx
                chunks[j // 14] |= 1 << (j % 14)
    return tuple(chunks)


def test_dhash_brightness_invariance():
    """Adding one constant to every pixel preserves every adjacent-cell
    comparison — the property that makes dHash a near-dup key."""
    rng = random.Random(7)
    w, h = 24, 16
    base = [rng.randrange(0, 200) for _ in range(w * h)]
    h0 = _dhash_of(bytes(base), w, h)
    for delta in (5, 20, 55):
        assert _dhash_of(bytes(v + delta for v in base), w, h) == h0


def test_dhash_single_cell_perturb_hamming_le_1():
    """Bumping only the (0,0) cell flips at most the one comparison
    that touches it in row 0 — the fixture family's planted hamming."""
    w, h = 16, 16  # 2x2 cells
    base = bytes((x // 2 * 13 + y // 2 * 29) % 180 for y in range(h) for x in range(w))
    pert = bytes(
        min(255, b + 40) if (x < 2 and y < 2) else b
        for (y, x), b in zip(((y, x) for y in range(h) for x in range(w)), base)
    )
    h0, h1 = _dhash_of(base, w, h), _dhash_of(pert, w, h)
    hamming = sum(bin(a ^ b).count("1") for a, b in zip(h0, h1))
    assert hamming <= 1


@pytest.mark.parametrize("dims", [(9, 7, 1), (1, 1, 1), (2, 3, 3), (7, 1, 1), (1, 9, 2), (16, 13, 3), (5, 5, 4)])
def test_adam7_roundtrip_and_equivalence(dims):
    """Interlaced encode -> decode reproduces the raster exactly and
    agrees with the straight-scan decode of the same image — including
    degenerate dims where several Adam7 passes are empty."""
    w, h, ch = dims
    raster = _ramp(w, h, ch)
    assert decode_png(encode_png(raster, w, h, ch, interlace=True)) == (w, h, ch, raster)
    assert decode_png(encode_png(raster, w, h, ch, interlace=True)) == decode_png(
        encode_png(raster, w, h, ch)
    )


def test_adam7_fuzz_deterministic_and_bounded():
    rng = random.Random(47)
    base = encode_png(_ramp(13, 9, 3), 13, 9, 3, interlace=True)
    for _ in range(200):
        blob = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        payload = bytes(blob)
        try:
            first = decode_png(payload)
        except (ValueError, struct.error, IndexError, zlib.error, OverflowError, MemoryError):
            continue
        assert decode_png(payload) == first


def test_text_chunks_and_jpeg_comments_robust():
    """Metadata walks are non-fatal: malformed tEXt (no NUL, oversize
    keyword) is skipped, truncated JPEG tails end the harvest, pixels
    are unaffected by planted metadata."""
    import struct as _s
    import zlib as _z

    from toyocr_spark.jpegcodec import (
        decode_baseline,
        encode_baseline,
        insert_comments,
        jpeg_comments,
    )
    from toyocr_spark.pngcodec import text_chunks

    r = _ramp(4, 4, 1)
    p = encode_png(r, 4, 4, 1, texts=[("Title", "hello"), ("Author", "site-3")])
    assert text_chunks(p) == [("Title", "hello"), ("Author", "site-3")]
    assert decode_png(p) == (4, 4, 1, r)

    # hand-build a tEXt with no NUL separator: skipped, not fatal
    def chunk(typ, data):
        return _s.pack(">I", len(data)) + typ + data + _s.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF)

    base = encode_png(r, 4, 4, 1)
    bad = base[:33] + chunk(b"tEXt", b"no-separator-here") + base[33:]
    assert text_chunks(bad) == []

    j = insert_comments(encode_baseline(bytes(64), 8, 8, 1), ["a", "b2"])
    assert jpeg_comments(j) == ["a", "b2"]
    assert decode_baseline(j)[3] == decode_baseline(encode_baseline(bytes(64), 8, 8, 1))[3]
    assert jpeg_comments(j[:6]) in ([], ["a"], [""])  # truncated: never raises past SOI


@pytest.mark.parametrize("depth", [1, 2, 4, 8, 16])
@pytest.mark.parametrize("interlace", [False, True])
def test_all_bit_depths_roundtrip(depth, interlace):
    """Every legal grayscale depth decodes to one byte per sample:
    16-bit as the high byte of the v*257 expansion (exact round trip),
    sub-byte scaled to the full 0-255 range."""
    w, h = 13, 7
    if depth >= 8:
        raw = _ramp(w, h, 1)
        expect = raw
    else:
        maxv = (1 << depth) - 1
        raw = bytes((x + y) % (maxv + 1) for y in range(h) for x in range(w))
        expect = bytes(v * 255 // maxv for v in raw)
    got = decode_png(encode_png(raw, w, h, 1, depth=depth, interlace=interlace))
    assert got == (w, h, 1, expect)


def test_palette_indices_stay_raw():
    """Color type 3: sub-byte samples are PLTE indices — decode must
    NOT scale them (hand-built depth-2 palette PNG, filter 0 rows)."""
    import struct as _s
    import zlib as _z

    def chunk(typ, data):
        return _s.pack(">I", len(data)) + typ + data + _s.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF)

    w, h = 5, 3
    idx = [[0, 1, 2, 3, 1], [3, 3, 0, 0, 2], [1, 0, 1, 0, 1]]
    rows = b""
    for r in idx:
        packed = bytearray((w * 2 + 7) // 8)
        for i, v in enumerate(r):
            packed[i // 4] |= v << (8 - 2 - 2 * (i % 4))
        rows += b"\x00" + bytes(packed)
    ihdr = _s.pack(">IIBBBBB", w, h, 2, 3, 0, 0, 0)
    plte = bytes(range(12))  # 4 RGB entries
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", _z.compress(rows))
        + chunk(b"IEND", b"")
    )
    got = decode_png(png)
    assert got == (w, h, 1, bytes(v for r in idx for v in r))


def test_illegal_depth_color_combo_rejected():
    # depth 2 truecolor is not a spec combination
    base = encode_png(_ramp(4, 4, 3), 4, 4, 3)
    bad = bytearray(base)
    bad[24] = 2  # depth byte
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_exif_entries_both_orders_and_fuzz():
    """EXIF IFD0 harvest: II and MM byte orders, inline SHORT vs
    offset ASCII, unknown tags skipped; bit-flipped APP1 never raises
    past the JPEG check and never decodes nondeterministically."""
    from toyocr_spark.jpegcodec import (
        build_exif_app1,
        encode_baseline,
        exif_entries,
        insert_app1,
    )

    j = encode_baseline(bytes(64), 8, 8, 1)
    for be in (False, True):
        app1 = build_exif_app1(
            [(0x0112, 6), (0x010F, "CamCo"), (0x9999, 1), (0x8298, "c 2026 site")],
            big_endian=be,
        )
        got = exif_entries(insert_app1(j, app1))
        assert got == [("Orientation", "6"), ("Make", "CamCo"), ("Copyright", "c 2026 site")]
    assert exif_entries(j) == []

    rng = random.Random(59)
    base = insert_app1(j, build_exif_app1([(0x0112, 3), (0x010F, "CamCo")], big_endian=False))
    for _ in range(300):
        blob = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        payload = bytes(blob)
        try:
            first = exif_entries(payload)
        except ValueError:
            continue  # SOI itself destroyed
        assert exif_entries(payload) == first


def test_idat_zip_bomb_is_bounded_by_declared_geometry():
    """A hostile IDAT that inflates far beyond the declared raster
    must not be materialized: decode reads exactly the bytes the IHDR
    geometry calls for (decompressobj max_length) and the result is
    identical to the honest encoding."""
    import tracemalloc

    w = h = 4
    raster = bytes((x * 7 + 3) % 256 for x in range(w * h))
    honest = encode_png(raster, w, h, 1)
    # rebuild the same PNG with 64 MiB of trailing zeros inside IDAT
    rowbytes = w + 1
    scanlines = b"".join(
        b"\x00" + raster[y * w : (y + 1) * w] for y in range(h)
    )
    bomb_stream = scanlines + b"\x00" * (64 << 20)
    bomb_idat = zlib.compress(bomb_stream, 9)
    # splice: header+IHDR from the honest file, then one IDAT + IEND
    def _chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    bomb = honest[:33] + _chunk(b"IDAT", bomb_idat) + _chunk(b"IEND", b"")
    tracemalloc.start()
    out = decode_png(bomb)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert out == decode_png(honest)
    assert peak < 8 << 20, f"zip bomb inflated {peak} bytes"

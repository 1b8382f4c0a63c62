"""Multimodal plumbing: FMED synth/decode round-trip, frame sampling,
fingerprint shape, and the real-codec stub seam."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from toyocr_spark.multimodal import (
    decode_media,
    media_fingerprint,
    parse_header,
    sample_frames,
    synth_media,
)


def _docs(spark):
    return spark.createDataFrame(
        [(0, "hello world"), (1, "abcdefgh" * 5), (513, "x")],
        "doc_id: long, text: string",
    )


def test_decode_round_trip(spark):
    out = {r["media_id"]: r for r in decode_media(synth_media(_docs(spark))).collect()}
    assert out[0]["kind"] == "image" and out[1]["kind"] == "audio"
    assert out[513]["width"] == 64 + 513 % 512 == 65
    assert out[0]["body_len"] == len(b"hello world")
    assert out[1]["channels"] == 2


def test_frame_sampling(spark):
    out = {r["media_id"]: r for r in sample_frames(synth_media(_docs(spark)), 4).collect()}
    assert out[1]["n_frames"] == 4
    assert out[1]["frame_len"] == 10 and out[1]["last_frame_len"] == 10
    # 1-byte body: 3 empty frames, remainder in the last
    assert out[513]["frame_len"] == 0 and out[513]["last_frame_len"] == 1


def test_fingerprint_shape_and_determinism(spark):
    a = media_fingerprint(synth_media(_docs(spark)), dim=8).collect()
    b = media_fingerprint(synth_media(_docs(spark)), dim=8).collect()
    assert {r["media_id"]: r["sig"] for r in a} == {r["media_id"]: r["sig"] for r in b}
    sig = next(r["sig"] for r in a if r["media_id"] == 1)
    assert len(sig) == 8 and abs(sum(sig) - 1.0) < 1e-3


def test_real_codec_is_documented_stub():
    # PNG is now a live codec; the remaining formats stay a documented
    # seam, and a truncated PNG fails loudly rather than decoding junk
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        parse_header(b"RIFF....WAVE")
    with pytest.raises(ValueError, match="IHDR"):
        parse_header(b"\x89PNG\r\n\x1a\n....")


def test_decode_partitioned_plan_has_no_extra_shuffle(spark):
    """decode is a map-only stage: repartitioned input must reach the
    UDF without another exchange."""
    media = synth_media(_docs(spark)).repartition(4, "media_id")
    plan = decode_media(media)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # only the explicit repartition


def _make_png(width: int, height: int, color_type: int = 2) -> bytes:
    """Hand-assemble a valid PNG (spec-conformant, CRCs included)."""
    import struct
    import zlib

    chans = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    # each scanline: filter byte 0 + deterministic pixel bytes
    raw = b"".join(
        b"\x00" + bytes((x * chans + c + y) % 256 for x in range(width) for c in range(chans))
        for y in range(height)
    )
    comp = zlib.compress(raw)
    # split IDAT in two chunks to exercise concatenation
    mid = len(comp) // 2
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp[:mid])
        + chunk(b"IDAT", comp[mid:])
        + chunk(b"IEND", b"")
    )


def test_png_decode_real_codec(spark):
    """q26's decode stage over genuine PNG bytes: IHDR dims/channels and
    the inflated scanline stream length (h * (1 + w*chans)) — the
    real-codec leg of the multimodal seam."""
    from toyocr_spark.multimodal import decode_media, parse_header

    png = _make_png(17, 9, color_type=2)
    kind, w, h, chans, body = parse_header(png)
    assert (kind, w, h, chans) == ("image", 17, 9, 3)
    assert len(body) == 9 * (1 + 17 * 3)

    rows = [(1, _make_png(17, 9, 2)), (2, _make_png(4, 6, 6)), (3, _make_png(8, 3, 0))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (17, 9, 3)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (4, 6, 4)
    assert (got[3]["width"], got[3]["height"], got[3]["channels"]) == (8, 3, 1)
    assert got[3]["body_len"] == 3 * (1 + 8 * 1)


def test_non_png_non_fmed_still_raises():
    from toyocr_spark.multimodal import parse_header

    with pytest.raises(NotImplementedError):
        parse_header(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # JPEG SOI

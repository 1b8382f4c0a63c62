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


def test_unknown_container_is_documented_stub():
    # PNG/GIF/JPEG/WAV/MP4 are live codecs; an unknown magic stays a
    # documented seam, and truncated PNG/GIF files fail loudly rather
    # than decoding junk
    with pytest.raises(NotImplementedError, match="implement decode"):
        parse_header(b"WEBP" + b"\x00" * 16)
    with pytest.raises(ValueError, match="IHDR"):
        parse_header(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        parse_header(b"GIF89a" + b"\x00" * 16)


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


def _make_jpeg(width: int, height: int, chans: int = 3) -> bytes:
    """Hand-assemble a structurally valid JPEG: SOI, APP0/JFIF, SOF0,
    SOS header, deterministic scan bytes, EOI."""
    import struct

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(chans))
    sof0 = seg(0xC0, struct.pack(">BHHB", 8, height, width, chans) + comps)
    sos = seg(0xDA, bytes([chans]) + b"".join(bytes([i + 1, 0]) for i in range(chans)) + b"\x00\x3f\x00")
    scan = bytes((i * 7) % 255 for i in range(64))  # no 0xFF bytes
    return b"\xff\xd8" + app0 + sof0 + sos + scan + b"\xff\xd9"


def _make_wav(rate: int, chans: int, n_samples: int) -> bytes:
    import struct

    pcm = struct.pack(f"<{n_samples * chans}h", *((i % 32767) for i in range(n_samples * chans)))
    fmt = struct.pack("<HHIIHH", 1, chans, rate, rate * chans * 2, chans * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _make_mp4(width: int, height: int, payload: bytes) -> bytes:
    import struct

    def box(typ: bytes, data: bytes) -> bytes:
        return struct.pack(">I", len(data) + 8) + typ + data

    tkhd = (
        b"\x00\x00\x00\x07"  # version 0, flags enabled
        + b"\x00" * 16  # ctime/mtime/track_id/reserved
        + b"\x00" * 4  # duration
        + b"\x00" * 8  # reserved
        + b"\x00" * 8  # layer/altgroup/volume/reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)  # matrix
        + struct.pack(">II", width << 16, height << 16)
    )
    moov = box(b"moov", box(b"trak", box(b"tkhd", tkhd)))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov + box(b"mdat", payload)


def test_jpeg_wav_mp4_live_codecs(spark):
    """All three remaining formats parse from their real byte layout."""
    kind, w, h, c, body = parse_header(_make_jpeg(31, 19, 3))
    assert (kind, w, h, c) == ("image", 31, 19, 3) and len(body) == 64

    kind, rate, zero, c, body = parse_header(_make_wav(16000, 2, 100))
    assert (kind, rate, zero, c) == ("audio", 16000, 0, 2) and len(body) == 400

    kind, w, h, c, body = parse_header(_make_mp4(640, 360, b"framedata" * 8))
    assert (kind, w, h, c) == ("video", 640, 360, 3) and len(body) == 72

    # and through the Spark decode stage, mixed formats in one batch
    rows = [
        (1, _make_jpeg(31, 19)),
        (2, _make_wav(8000, 1, 10)),
        (3, _make_mp4(320, 240, b"x" * 11)),
        (4, _make_png(4, 6, 6)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_media(media).collect()}
    assert got[1]["kind"] == "image" and got[1]["width"] == 31
    assert got[2]["kind"] == "audio" and got[2]["width"] == 8000
    assert got[3]["kind"] == "video" and (got[3]["width"], got[3]["height"]) == (320, 240)
    assert got[4]["kind"] == "image"
    # frame sampling over a real MP4's mdat payload
    frames = sample_frames(
        spark.createDataFrame([(9, _make_mp4(64, 48, b"v" * 41))], "media_id long, payload binary"), 4
    ).collect()[0]
    assert frames["n_frames"] == 4 and frames["frame_len"] == 10 and frames["last_frame_len"] == 11


def _make_wav_pcm(rate: int, samples: list[int]) -> bytes:
    import struct

    pcm = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_audio_features_match_hand_model(spark):
    """audio_features over real PCM: zero crossings / peak / RMS agree
    with a transparent per-sample model; non-audio rows are skipped."""
    import random

    from toyocr_spark.multimodal import audio_features

    rng = random.Random(3)
    waves = {
        1: [0, 1000, -1000, 1000, -1000],          # alternating: 4 crossings
        2: [100] * 7,                               # constant positive: 0
        3: [rng.randint(-30000, 30000) for _ in range(500)],
    }
    rows = [(mid, _make_wav_pcm(8000, s)) for mid, s in waves.items()]
    rows.append((9, _make_png(8, 4)))  # image row: must not emit
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_features(df, frame_samples=128).collect()}

    assert set(got) == {1, 2, 3}
    for mid, s in waves.items():
        zc = sum(
            1
            for a, b in zip(s, s[1:])
            if (a >= 0) != (b >= 0)
        )
        peak = max(abs(x) for x in s)
        rms = round((sum(x * x for x in s) / len(s)) ** 0.5, 6)
        r = got[mid]
        assert r["n_samples"] == len(s)
        assert r["zero_crossings"] == zc
        assert r["peak"] == peak
        assert r["rms"] == rms
        assert r["n_frames"] == -(-len(s) // 128)


def test_jpeg_baseline_pixel_decode_roundtrip():
    """The JPEG leg is a real pixel decoder now: encode a known raster
    with the fixture encoder (flat Huffman tables, real bitstream) and
    get the pixels back within JPEG quantization error — across 4:4:4,
    4:2:0 subsampling, and restart intervals."""
    from toyocr_spark.jpegcodec import decode_baseline, encode_baseline

    w, h = 35, 21
    smooth = bytes(50 + x * 2 + y + c * 20 for y in range(h) for x in range(w) for c in range(3))
    for kw in ({}, {"subsample": True}, {"subsample": True, "restart_interval": 2}):
        jp = encode_baseline(smooth, w, h, 3, quality=95, **kw)
        W, H, C, rast = decode_baseline(jp)
        assert (W, H, C, len(rast)) == (w, h, 3, w * h * 3)
        assert max(abs(a - b) for a, b in zip(rast, smooth)) <= 2, kw
        assert decode_baseline(jp) == decode_baseline(jp)  # deterministic

    # grayscale, non-multiple-of-8 dims, restart markers
    g = bytes(40 + x + y for y in range(19) for x in range(26))
    jp = encode_baseline(g, 26, 19, 1, quality=95, restart_interval=3)
    W, H, C, rast = decode_baseline(jp)
    assert (W, H, C) == (26, 19, 1)
    assert max(abs(a - b) for a, b in zip(rast, g)) <= 2

    # DC-only content decodes EXACTLY (flat block == DC * basis)
    flat = bytes([200]) * (16 * 8)
    _, _, _, rast = decode_baseline(encode_baseline(flat, 16, 8, 1, quality=90))
    assert set(rast) == {200}


def test_jpeg_pixels_flow_through_decode_media(spark):
    """decode_media's body_len for a baseline JPEG is the DECODED
    raster size (w*h*channels), not the entropy-coded scan length —
    the same contract as the PNG leg; non-baseline files (the header
    fixture has no DQT/DHT) still fall back to the scan body."""
    from toyocr_spark.jpegcodec import encode_baseline

    w, h = 24, 10
    rgb = bytes(30 + x * 3 + y * 2 + c * 10 for y in range(h) for x in range(w) for c in range(3))
    rows = [(1, encode_baseline(rgb, w, h, 3, quality=90)), (2, _make_jpeg(31, 19, 3))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (w, h, 3)
    assert got[1]["body_len"] == w * h * 3  # true pixels
    assert got[2]["body_len"] == 64  # header-only fallback: scan bytes


def test_jpeg_fingerprint_stable_across_batch_boundaries(spark):
    """media_fingerprint over decoded JPEG pixels is a pure function of
    the payload: one-row batches and a single multi-row batch give
    identical signatures."""
    from toyocr_spark.jpegcodec import encode_baseline

    payloads = [
        (i, encode_baseline(
            bytes((20 + x * (2 + i) + y + c * 15) % 256 for y in range(12) for x in range(16) for c in range(3)),
            16, 12, 3, quality=92,
        ))
        for i in range(4)
    ]
    one = spark.createDataFrame(payloads, "media_id long, payload binary").repartition(1)
    many = spark.createDataFrame(payloads, "media_id long, payload binary").repartition(4)
    a = {r["media_id"]: r["sig"] for r in media_fingerprint(one).collect()}
    b = {r["media_id"]: r["sig"] for r in media_fingerprint(many).collect()}
    assert a == b and len(a) == 4


def test_jpeg_decoder_fuzz_deterministic_and_bounded():
    """Hostile-input guard for the pixel decoder (the PDF parser has
    the same): random truncations and bit flips of a valid baseline
    JPEG either decode deterministically or raise a clean ValueError —
    never hang, never crash with a non-ValueError, and parse_header
    always returns (falling back to the header path when pixel decode
    rejects)."""
    import random

    from toyocr_spark.jpegcodec import decode_baseline, encode_baseline
    from toyocr_spark.multimodal import parse_header

    base = encode_baseline(
        bytes(40 + x + y for y in range(24) for x in range(32)), 32, 24, 1,
        quality=90, restart_interval=2,
    )
    rng = random.Random(7)
    for trial in range(300):
        b = bytearray(base)
        if trial % 3 == 0:
            b = b[: rng.randrange(2, len(b))]          # truncation
        elif trial % 3 == 1:
            for _ in range(rng.randrange(1, 6)):        # bit flips
                i = rng.randrange(len(b))
                b[i] ^= 1 << rng.randrange(8)
        else:
            i = rng.randrange(len(b))                   # byte splice
            b = b[:i] + bytes([rng.randrange(256)]) + b[i:]
        payload = bytes(b)

        def attempt():
            try:
                return decode_baseline(payload)
            except (ValueError, KeyError, IndexError) as e:
                # bounded, clean rejection classes (missing Huffman
                # table = KeyError; short buffer = IndexError); the
                # DISPATCH layer below must still normalize these
                return ("rejected", type(e).__name__)

        first, second = attempt(), attempt()
        assert first == second  # deterministic either way
        if payload[:2] == b"\xff\xd8" and len(payload) > 4:
            # the dispatch layer must survive every mutation with at
            # most a clean ValueError (never struct.error/KeyError —
            # a worker task dying on garbage media is a pipeline bug)
            try:
                parse_header(payload)
            except ValueError:
                pass


# ----------------------------------------------------------- MP4 demux


def test_mp4_demux_exact_byte_ranges(spark):
    """demux_samples re-derives each sample's bytes exactly from the
    sample table, across chunk layouts (even, short-last-chunk, single
    sample)."""
    from toyocr_spark.multimodal import _mux_mp4, demux_samples
    import hashlib

    rows = []
    truth = {}
    for mid, n in [(1, 1), (2, 2), (3, 5), (4, 4)]:
        samples = [f"s{mid}:{i}!".encode() * (1 + i) for i in range(n)]
        rows.append((mid, _mux_mp4(mid, 64, 48, samples)))
        truth[mid] = samples
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = demux_samples(media).collect()
    by_key = {(r["media_id"], r["sample_idx"]): r for r in got}
    assert len(by_key) == sum(len(s) for s in truth.values())
    for mid, samples in truth.items():
        for i, s in enumerate(samples):
            r = by_key[(mid, i)]
            assert r["codec"] == "rawv"
            assert r["sample_len"] == len(s)
            assert r["sample_md5"] == hashlib.md5(s).hexdigest()


def test_mp4_sample_table_uniform_stsz_and_co64():
    """Parser handles the uniform-size stsz shortcut and 64-bit co64
    offsets (neither produced by _mux_mp4, both in real crawls)."""
    import struct

    from toyocr_spark.multimodal import _parse_mp4_sample_table

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    samples = [b"AAAA", b"BBBB", b"CCCC"]
    stsd = box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + box(b"rawv", b"\x00" * 8))
    stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 4, 3))  # uniform size 4
    stsc = box(b"stsc", b"\x00" * 4 + struct.pack(">I", 1) + struct.pack(">III", 1, 3, 1))

    def build(co64_off: int) -> bytes:
        co64 = box(b"co64", b"\x00" * 4 + struct.pack(">I", 1) + struct.pack(">Q", co64_off))
        stbl = box(b"stbl", stsd + stsz + stsc + co64)
        moov = box(b"moov", box(b"trak", box(b"mdia", box(b"minf", stbl))))
        return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov

    head = build(0)
    payload = build(len(head) + 8) + box(b"mdat", b"".join(samples))
    codec, spans = _parse_mp4_sample_table(payload)
    assert codec == "rawv"
    assert [payload[o : o + s] for o, s in spans] == samples


def test_mp4_without_sample_table_skipped_not_fatal(spark):
    """Tables mix demuxable and header-only MP4s; the demux op keeps
    the former and silently skips the latter (same convention as
    audio_features over mixed kinds)."""
    from toyocr_spark.multimodal import _mux_mp4, demux_samples

    rows = [
        (1, _mux_mp4(1, 64, 48, [b"only-sample"])),
        (2, _make_mp4(320, 240, b"no-sample-table")),
        (3, b"\x89PNG\r\n\x1a\x08 not even close"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = demux_samples(media).collect()
    assert [r["media_id"] for r in got] == [1]


def test_jpeg_progressive_decode_matches_sequential():
    """Progressive (SOF2) decode is real now: encode_progressive
    transports the SAME quantized coefficients as encode_baseline, so
    the decoded rasters must be byte-identical — across spectral
    splits, 4:2:0 subsampling, restart-marked DC scans, grayscale, and
    non-multiple-of-8 dims."""
    from toyocr_spark.jpegcodec import (
        decode_baseline,
        encode_baseline,
        encode_progressive,
    )

    w, h = 35, 21
    smooth = bytes(50 + x * 2 + y + c * 20 for y in range(h) for x in range(w) for c in range(3))
    for kw in (
        {},
        {"spectral_split": 20},
        {"subsample": True},
        {"subsample": True, "restart_interval": 2},
        {"subsample": True, "spectral_split": 6, "restart_interval": 3},
    ):
        seq = encode_baseline(smooth, w, h, 3, quality=95, subsample=kw.get("subsample", False))
        prog = encode_progressive(smooth, w, h, 3, quality=95, **kw)
        assert decode_baseline(prog) == decode_baseline(seq), kw
        assert decode_baseline(prog) == decode_baseline(prog)  # deterministic

    g = bytes(40 + x + y for y in range(19) for x in range(26))
    assert decode_baseline(encode_progressive(g, 26, 19, 1, quality=95)) == decode_baseline(
        encode_baseline(g, 26, 19, 1, quality=95)
    )


def test_jpeg_progressive_flows_through_decode_media(spark):
    """A progressive payload now reaches the pixel path: decode_media's
    body_len is the DECODED raster size, identical to the sequential
    encoding of the same image."""
    from toyocr_spark.jpegcodec import encode_baseline, encode_progressive

    w, h = 24, 10
    rgb = bytes(30 + x * 3 + y * 2 + c * 10 for y in range(h) for x in range(w) for c in range(3))
    rows = [
        (1, encode_progressive(rgb, w, h, 3, quality=90, spectral_split=10)),
        (2, encode_baseline(rgb, w, h, 3, quality=90)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_media(media).collect()}
    for mid in (1, 2):
        assert (got[mid]["width"], got[mid]["height"], got[mid]["channels"]) == (w, h, 3)
        assert got[mid]["body_len"] == w * h * 3


def test_jpeg_progressive_fuzz_deterministic_and_bounded():
    """Hostile-input guard for the progressive path, mirroring the
    baseline fuzz test: truncations / bit flips / splices either decode
    deterministically or reject cleanly, and parse_header always
    returns (header fallback) for anything still carrying the SOI
    magic."""
    import random

    from toyocr_spark.jpegcodec import decode_baseline, encode_progressive
    from toyocr_spark.multimodal import parse_header

    base = encode_progressive(
        bytes(40 + x + y for y in range(24) for x in range(32)), 32, 24, 1,
        quality=90, spectral_split=12, restart_interval=2,
    )
    rng = random.Random(13)
    for trial in range(300):
        b = bytearray(base)
        if trial % 3 == 0:
            b = b[: rng.randrange(2, len(b))]
        elif trial % 3 == 1:
            for _ in range(rng.randrange(1, 6)):
                i = rng.randrange(len(b))
                b[i] ^= 1 << rng.randrange(8)
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes([rng.randrange(256)]) + b[i:]
        payload = bytes(b)

        def attempt():
            try:
                return decode_baseline(payload)
            except (ValueError, KeyError, IndexError) as e:
                return ("rejected", type(e).__name__)

        first, second = attempt(), attempt()
        assert first == second
        if payload[:2] == b"\xff\xd8" and len(payload) > 4:
            try:
                parse_header(payload)
            except ValueError:
                pass  # clean dispatch-level rejection is allowed


# --------------------------------------------------- MJPEG frame decode


def test_mjpeg_frames_decode_true_pixels(spark):
    """decode_video_frames demuxes each MJPEG sample and decodes it to
    a real raster: dims/length match the synthesis parameters, the
    raster md5 equals a direct local decode of the same sample bytes,
    and pixel values track the pre-encode source raster (lossy JPEG,
    so mean absolute error bounded, not byte equality)."""
    import hashlib

    from toyocr_spark.jpegcodec import decode_baseline, encode_baseline
    from toyocr_spark.multimodal import (
        _mjpeg_raster,
        _mux_mp4,
        decode_video_frames,
    )

    rows = []
    truth = {}
    for did in (0, 3, 17, 51):
        w, h = 8 + did % 17, 8 + did % 13
        frames = [
            encode_baseline(_mjpeg_raster(did, f, w, h, 3), w, h, 3, quality=90)
            for f in range(1 + did % 4)
        ]
        rows.append((did, _mux_mp4(did, w, h, frames, fourcc=b"jpeg")))
        truth[did] = (w, h, frames)
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {(r["media_id"], r["frame_idx"]): r for r in decode_video_frames(media).collect()}
    assert len(got) == sum(len(f) for _, _, f in truth.values())
    for did, (w, h, frames) in truth.items():
        for i, sample in enumerate(frames):
            r = got[(did, i)]
            assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
            assert r["raster_len"] == w * h * 3
            dw, dh, dc, raster = decode_baseline(sample)
            assert r["raster_md5"] == hashlib.md5(raster).hexdigest()
            src = _mjpeg_raster(did, i, w, h, 3)
            mae = sum(abs(a - b) for a, b in zip(src, raster)) / len(src)
            assert mae < 12.0, f"doc {did} frame {i}: MAE {mae}"


def test_mjpeg_frames_skip_non_mjpeg_codecs(spark):
    """Non-MJPEG fourccs (rawv here, avc1 in real crawls) are skipped,
    not decoded or fatal — the codec seam stays explicit."""
    from toyocr_spark.jpegcodec import encode_baseline
    from toyocr_spark.multimodal import _mjpeg_raster, _mux_mp4, decode_video_frames

    jpeg_frame = encode_baseline(_mjpeg_raster(1, 0, 8, 8, 3), 8, 8, 3, quality=90)
    rows = [
        (1, _mux_mp4(1, 8, 8, [jpeg_frame], fourcc=b"jpeg")),
        (2, _mux_mp4(2, 8, 8, [jpeg_frame], fourcc=b"rawv")),
        (3, _mux_mp4(3, 8, 8, [b"not-a-jpeg-sample"], fourcc=b"avc1")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = decode_video_frames(media).collect()
    assert [r["media_id"] for r in got] == [1]


def test_mp4_pcm_audio_matches_wav_features(spark):
    """The same int16 PCM stream carried as a WAV file and as a
    sowt-MP4 (split across sample-table chunks) must yield identical
    ZCR/peak/RMS — demux order and signal arithmetic agree."""
    import struct

    from toyocr_spark.multimodal import (
        _mux_mp4,
        audio_features,
        mp4_audio_features,
    )

    vals = [((m * 13 + j * 7) % 4001) - 2000 for m in (5,) for j in range(96)]
    pcm = b"".join(struct.pack("<h", v) for v in vals)

    def wav(body: bytes) -> bytes:
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(body)) + body
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    wav_media = spark.createDataFrame([(1, wav(pcm))], "media_id long, payload binary")
    mp4_media = spark.createDataFrame(
        [(1, _mux_mp4(1, 0, 0, [pcm[:64], pcm[64:128], pcm[128:]], fourcc=b"sowt"))],
        "media_id long, payload binary",
    )
    a = audio_features(wav_media).collect()[0]
    b = mp4_audio_features(mp4_media).collect()[0]
    for f in ("n_samples", "zero_crossings", "peak", "rms"):
        assert a[f] == b[f], f


def test_mp4_audio_skips_non_pcm_codecs(spark):
    from toyocr_spark.multimodal import _mux_mp4, mp4_audio_features

    rows = [
        (1, _mux_mp4(1, 0, 0, [b"\x01\x00\x02\x00"], fourcc=b"sowt")),
        (2, _mux_mp4(2, 0, 0, [b"\x01\x00\x02\x00"], fourcc=b"mp4a")),
        (3, b"not mp4 at all"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = mp4_audio_features(media).collect()
    assert [r["media_id"] for r in got] == [1]


def test_gif_lzw_roundtrip_including_reset_and_interlace():
    """The pure-stdlib GIF codec round-trips arbitrary index rasters,
    including rasters long enough to force a 4096-entry LZW dictionary
    reset and the four-pass interlace row order."""
    import random

    from toyocr_spark.gifcodec import decode_gif, encode_gif

    rng = random.Random(11)
    for _ in range(40):
        w, h = rng.randint(1, 30), rng.randint(1, 30)
        npal = rng.choice([2, 4, 7, 16, 256])
        pal = [(rng.randrange(256),) * 3 for _ in range(npal)]
        idx = bytes(rng.randrange(npal) for _ in range(w * h))
        inter = rng.random() < 0.5
        gw, gh, gpal, graster = decode_gif(
            encode_gif(idx, w, h, pal, interlace=inter)
        )
        assert (gw, gh) == (w, h)
        assert graster == idx
    # long low-entropy raster: dictionary crosses 4096 and resets
    idx = bytes((i // 7) % 3 for i in range(50000))
    _, _, _, out = decode_gif(
        encode_gif(idx, 250, 200, [(1, 2, 3), (4, 5, 6), (7, 8, 9)])
    )
    assert out == idx


def test_gif_flows_through_decode_media(spark):
    """parse_header dispatches on the GIF magic: body is the decoded
    index raster (1 channel per pixel, like the PNG palette leg)."""
    from toyocr_spark.gifcodec import encode_gif
    from toyocr_spark.multimodal import decode_media, parse_header

    pal = [(i, 2 * i, 3 * i) for i in range(4)]
    idx = bytes((x + y) % 4 for y in range(9) for x in range(13))
    gif = encode_gif(idx, 13, 9, pal, interlace=True)
    kind, w, h, chans, body = parse_header(gif)
    assert (kind, w, h, chans) == ("image", 13, 9, 1)
    assert body == idx

    media = spark.createDataFrame([(1, gif)], "media_id long, payload binary")
    row = decode_media(media).collect()[0]
    assert (row["width"], row["height"], row["channels"], row["body_len"]) == (
        13, 9, 1, 13 * 9,
    )


def test_g711_tables_match_audioop():
    """All 256 code points of both companding laws agree with CPython's
    reference implementation (Modules/audioop.c wraps the classic sun
    g711.c tables). Skipped where audioop has been removed (3.13+)."""
    audioop = pytest.importorskip("audioop")
    import struct

    from toyocr_spark.multimodal import _alaw_expand, _ulaw_expand

    for b in range(256):
        assert (
            struct.unpack("<h", audioop.ulaw2lin(bytes([b]), 2))[0]
            == _ulaw_expand(b)
        ), f"ulaw byte {b}"
        assert (
            struct.unpack("<h", audioop.alaw2lin(bytes([b]), 2))[0]
            == _alaw_expand(b)
        ), f"alaw byte {b}"


def test_g711_wav_decodes_to_expanded_pcm(spark):
    """A mu-law WAV's parse_header body is the EXPANDED int16 stream
    (decode-at-parse), and audio_features over companded WAVs equals
    audio_features over the equivalent linear-PCM WAV."""
    import struct

    from toyocr_spark.multimodal import (
        _ulaw_expand,
        audio_features,
        parse_header,
    )

    data = bytes((j * 37) % 256 for j in range(80))

    def wav(tag: int, body: bytes, bits: int) -> bytes:
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000 * bits // 8, bits // 8, bits)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(body)) + body
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    expanded = b"".join(struct.pack("<h", _ulaw_expand(b)) for b in data)
    kind, rate, _, chans, body = parse_header(wav(7, data, 8))
    assert (kind, rate, chans) == ("audio", 8000, 1)
    assert body == expanded

    media = spark.createDataFrame(
        [(1, wav(7, data, 8)), (2, wav(1, expanded, 16))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in audio_features(media).collect()}
    for f in ("n_samples", "zero_crossings", "peak", "rms"):
        assert got[1][f] == got[2][f], f


def test_wav_unknown_format_tag_raises():
    """Format tags beyond PCM/G.711/IMA-ADPCM (e.g. 0x55 MP3-in-WAV)
    are the documented library-bound seam and fail loudly, not
    silently."""
    import struct

    from toyocr_spark.multimodal import parse_header

    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 4000, 1, 4)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", 4) + b"\x00\x01\x02\x03"
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(ValueError, match="codec library"):
        parse_header(wav)


def test_gif_decoder_fuzz_deterministic_and_bounded():
    """Random and bit-flipped GIF bytes either decode or raise
    ValueError — never hang, crash, or decode nondeterministically
    (same guard discipline as the JPEG fuzz tests)."""
    import random
    import struct

    from toyocr_spark.gifcodec import decode_gif, encode_gif

    rng = random.Random(23)
    base = encode_gif(
        bytes((x + y) % 5 for y in range(11) for x in range(17)),
        17, 11,
        [(i * 9 % 256,) * 3 for i in range(5)],
        interlace=True,
    )
    for _ in range(300):
        blob = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        payload = bytes(blob)
        try:
            first = decode_gif(payload)
        except (ValueError, struct.error, IndexError):
            continue
        assert decode_gif(payload) == first
    for _ in range(100):
        junk = b"GIF89a" + bytes(rng.randrange(256) for _ in range(rng.randint(0, 200)))
        try:
            first = decode_gif(junk)
        except (ValueError, struct.error, IndexError):
            continue
        assert decode_gif(junk) == first


def test_image_neardup_recovers_planted_groups(spark, sf_dir):
    """q108 semantics, not just engine parity: every planted duplicate
    pair (same doc_id % 40 group: same picture up to brightness /
    one perturbed corner cell) must surface, at hamming <= 1."""
    from toyocr_spark.multimodal import image_dhash, synth_dhash_png
    from toyocr_spark.operators.dedup import simhash64_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sim = (
        image_dhash(synth_dhash_png(docs, n_docs=160))
        .withColumnRenamed("media_id", "id")
        .select("id", "c0", "c1", "c2", "c3")
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash64_pairs(sim).collect()}
    planted = [
        (a, a + 40 * k)
        for a in range(40)
        for k in range(1, 4)
    ] + [(a + 40 * i, a + 40 * j) for a in range(40) for i in range(1, 4) for j in range(i + 1, 4)]
    for p in planted:
        assert p in pairs, f"planted duplicate pair {p} missed"
        assert pairs[p] <= 1


def test_audio_neardup_recovers_planted_groups(spark, sf_dir):
    """q110 semantics: every planted audio duplicate pair (same
    doc_id % 30 signal at a different gain, possibly one perturbed
    frame) must surface, at hamming <= 1 (perturbation only ever
    touches the E0<->E1 comparison)."""
    from toyocr_spark.multimodal import audio_fingerprint, synth_fp_wav
    from toyocr_spark.operators.dedup import simhash64_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sim = (
        audio_fingerprint(synth_fp_wav(docs, n_docs=150))
        .withColumnRenamed("media_id", "id")
        .select("id", "c0", "c1", "c2", "c3")
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash64_pairs(sim).collect()}
    for a in range(30):
        members = [a + 30 * k for k in range(5)]
        for i in range(5):
            for j in range(i + 1, 5):
                p = (members[i], members[j])
                assert p in pairs, f"planted audio pair {p} missed"
                assert pairs[p] <= 1


def test_jpeg_cmyk_and_ycck_decode():
    """4-component Adobe JPEGs decode to real CMYK rasters: raw planes
    (transform 0) and YCCK (transform 2 — CMYK through inverted RGB ->
    YCbCr with K passthrough, the dominant Adobe layout). Smooth
    gradients round-trip within quantization tolerance; flat blocks
    exactly; both byte-deterministic."""
    from toyocr_spark.jpegcodec import decode_baseline, encode_baseline

    w, h = 24, 16
    cmyk = bytes(
        v for y in range(h) for x in range(w)
        for v in ((x * 6) % 200, (y * 8) % 200, ((x + y) * 5) % 200, 40 + ((x * 2 + y) % 100))
    )
    for tf, tol in ((0, 2), (2, 4)):
        jp = encode_baseline(cmyk, w, h, 4, quality=92, cmyk_transform=tf)
        W, H, C, rast = decode_baseline(jp)
        assert (W, H, C, len(rast)) == (w, h, 4, w * h * 4)
        assert max(abs(a - b) for a, b in zip(rast, cmyk)) <= tol, tf
        assert decode_baseline(jp) == decode_baseline(jp)
    flat = bytes([120, 60, 200, 30]) * (w * h)
    _, _, _, r2 = decode_baseline(encode_baseline(flat, w, h, 4, quality=95))
    assert set(zip(r2[0::4], r2[1::4], r2[2::4], r2[3::4])) == {(120, 60, 200, 30)}
    # flows through the parse_header contract as a 4-channel image
    from toyocr_spark.multimodal import parse_header

    kind, W, H, C, body = parse_header(encode_baseline(flat, w, h, 4))
    assert (kind, W, H, C, len(body)) == ("image", w, h, 4, w * h * 4)


def test_ima_adpcm_wav_decode():
    """WAVE tag 17 (IMA/DVI ADPCM) expands at parse like the G.711
    legs: hand-worked known vector for the decoder (independent of the
    fixture encoder), sine tracking within the adaptive step bound,
    container integration, and byte determinism."""
    import array
    import math
    import struct as _s

    from toyocr_spark.multimodal import (
        _ima_adpcm_decode,
        _ima_adpcm_encode,
        _parse_wav,
    )

    # hand-worked: predictor 100, index 10 (step 19), byte 0x83 ->
    # nibbles (3, 8): +15 -> 115 (index 9, step 17), then -2 -> 113
    block = _s.pack("<h", 100) + bytes([10, 0, 0x83])
    got = array.array("h")
    got.frombytes(_ima_adpcm_decode(block, 5))
    assert list(got) == [100, 115, 113]

    pcm = [int(8000 * math.sin(i / 5)) for i in range(27)]
    data, ba = _ima_adpcm_encode(pcm, block_samples=9)
    dec = array.array("h")
    dec.frombytes(_ima_adpcm_decode(data, ba))
    assert len(dec) == len(pcm)
    assert max(abs(a - b) for a, b in zip(pcm, dec)) < 2000
    assert _ima_adpcm_decode(data, ba) == _ima_adpcm_decode(data, ba)

    fmt = _s.pack("<HHIIHH", 17, 1, 8000, 0, ba, 4)
    chunks = (
        b"fmt " + _s.pack("<I", len(fmt)) + fmt
        + b"data" + _s.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    wav = b"RIFF" + _s.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    kind, rate, _, ch, body = _parse_wav(wav)
    assert (kind, rate, ch) == ("audio", 8000, 1)
    out = array.array("h")
    out.frombytes(body)
    assert list(out) == list(dec)


def test_media_kernels_skip_undecodable_payloads(spark):
    """Corpus-job robustness: a non-PNG or truncated payload must not
    fail the dHash kernel (no hash row => admitted downstream), and a
    2-byte JPEG stub must not fail the metadata harvest."""
    from toyocr_spark.multimodal import image_dhash, media_metadata
    from toyocr_spark.pngcodec import encode_png

    good = encode_png(bytes(range(16)), 4, 4, 1)
    rows = [
        (1, good),
        (2, b"\x89PNG\r\n\x1a\n123"),      # truncated PNG
        (3, b"\xff\xd8"),                  # 2-byte JPEG stub
        (4, b"totally not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashed = image_dhash(df).collect()
    assert [r["media_id"] for r in hashed] == [1]
    meta = media_metadata(df).collect()
    assert meta == []  # nothing harvested, nothing crashed


def test_adpcm_wav_features_match_decoded_pcm(spark):
    """audio_features over an IMA-ADPCM WAV equals audio_features over
    a plain PCM WAV containing the decoder's output — the codec is
    transparent to every downstream audio operator."""
    import array
    import math
    import struct as _s

    from toyocr_spark.multimodal import (
        _ima_adpcm_decode,
        _ima_adpcm_encode,
        audio_features,
    )

    pcm_in = [int(6000 * math.sin(i / 4)) for i in range(27)]
    data, ba = _ima_adpcm_encode(pcm_in, block_samples=9)
    decoded = array.array("h")
    decoded.frombytes(_ima_adpcm_decode(data, ba))

    fmt_a = _s.pack("<HHIIHH", 17, 1, 8000, 0, ba, 4)
    adpcm_wav = (
        b"RIFF" + _s.pack("<I", 0) + b"WAVE"
        + b"fmt " + _s.pack("<I", len(fmt_a)) + fmt_a
        + b"data" + _s.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    pcm_bytes = decoded.tobytes()
    fmt_p = _s.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    pcm_wav = (
        b"RIFF" + _s.pack("<I", 0) + b"WAVE"
        + b"fmt " + _s.pack("<I", len(fmt_p)) + fmt_p
        + b"data" + _s.pack("<I", len(pcm_bytes)) + pcm_bytes
    )
    df = spark.createDataFrame(
        [(1, adpcm_wav), (2, pcm_wav)], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in audio_features(df).collect()}
    a, p = rows[1], rows[2]
    assert (a["n_samples"], a["zero_crossings"], a["peak"], a["rms"]) == (
        p["n_samples"], p["zero_crossings"], p["peak"], p["rms"],
    )


def test_parse_header_truncation_contract():
    """Every truncation of a valid WAV/MP4/PNG payload either parses or
    raises ValueError/NotImplementedError — never struct.error or
    IndexError (hostile bytes must reject cleanly in the kernel)."""
    import struct as _s

    from toyocr_spark.multimodal import parse_header

    fmt = _s.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = (
        b"fmt " + _s.pack("<I", len(fmt)) + fmt
        + b"data" + _s.pack("<I", 100) + bytes(range(100))
    )
    wav = b"RIFF" + _s.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def box(t, d):
        return _s.pack(">I", len(d) + 8) + t + d

    mp4 = (
        box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + box(b"moov", box(b"trak", box(b"tkhd", b"\x00" * 84)))
        + box(b"mdat", b"x" * 20)
    )
    png = _make_png(9, 5, 0)
    for payload in (wav, mp4, png):
        for k in range(2, len(payload)):
            try:
                parse_header(payload[:k])
            except (ValueError, NotImplementedError):
                continue


def test_svg_live_format():
    """SVG parses as a vector image: dims from attributes or viewBox,
    body = visible text nodes; media_metadata mines title/desc."""
    from toyocr_spark.multimodal import parse_header

    svg = (
        b'<?xml version="1.0"?>\n<svg xmlns="http://www.w3.org/2000/svg" '
        b'width="320" height="200"><title>logo</title>'
        b"<text>a</text><text>b <tspan>c</tspan></text></svg>"
    )
    assert parse_header(svg) == ("image", 320, 200, 0, b"a b c")
    assert parse_header(b'<svg viewBox="0 0 640 480"><text>vb</text></svg>')[:4] == (
        "image", 640, 480, 0,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_header(b"<svg><rect/></svg>")  # no parseable dimensions


def test_id3_harvest_in_media_metadata(spark):
    """ID3v2 text frames (both v2.3 plain and v2.4 syncsafe sizes)
    harvest through media_metadata without touching the audio frames;
    bit-flipped tags never raise past the magic check."""
    import random

    from toyocr_spark.multimodal import build_id3, id3_frames, media_metadata

    rows = [
        (1, build_id3([("title", "Song A"), ("artist", "Band-7")], major=3)),
        (2, build_id3([("album", "LP"), ("year", "2026")], major=4)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {(r.media_id, r.meta_key): r.meta_value for r in media_metadata(df).collect()}
    assert got == {
        (1, "title"): "Song A",
        (1, "artist"): "Band-7",
        (2, "album"): "LP",
        (2, "year"): "2026",
    }
    rng = random.Random(71)
    base = rows[0][1]
    for _ in range(300):
        blob = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        payload = bytes(blob)
        try:
            first = id3_frames(payload)
        except ValueError:
            continue
        assert id3_frames(payload) == first


def test_review_fix_regressions():
    """Pinned regressions from the round-3 self-review: SVG attribute
    boundaries and viewBox dialects, stts run-length amplification
    guard, ID3 unsynchronisation + extended headers."""
    import struct as _s

    import pytest as _pytest

    from toyocr_spark.multimodal import (
        _parse_mp4_timing,
        build_id3,
        id3_frames,
        parse_header,
    )

    # stroke-width must not parse as width; viewBox fills only missing
    assert parse_header(
        b'<svg stroke-width="2" height="100" viewBox="0 0 640 480"><text>a</text></svg>'
    )[:4] == ("image", 640, 100, 0)
    assert parse_header(b'<svg viewBox="0,0,640.5,480"><text>a</text></svg>')[:4] == (
        "image", 640, 480, 0,
    )

    # hostile stts: one entry claiming 2^32 samples must reject fast
    def box(t, d):
        return _s.pack(">I", len(d) + 8) + t + d

    stts = box(b"stts", b"\x00" * 4 + _s.pack(">III", 1, 0xFFFFFFFF, 1))
    mdhd = box(b"mdhd", b"\x00" * 12 + _s.pack(">II", 1000, 0) + b"\x00" * 4)
    mp4 = box(b"ftyp", b"isom\x00\x00\x02\x00iso2") + box(
        b"moov", box(b"trak", box(b"mdia", mdhd + box(b"minf", box(b"stbl", stts))))
    )
    with _pytest.raises(ValueError, match="implausibly"):
        _parse_mp4_timing(mp4)

    # unsynchronised v2.3 tag: FF 00 escapes removed before the walk
    plain = build_id3([("title", "Song\xff A")], major=3)
    hdr, body = plain[:10], plain[10:]
    tag_len = _syncsafe_len = (hdr[6] << 21) | (hdr[7] << 14) | (hdr[8] << 7) | hdr[9]
    tag, rest = body[:tag_len], body[tag_len:]
    unsynced = tag.replace(b"\xff", b"\xff\x00")
    new_len = len(unsynced)
    new_hdr = hdr[:5] + bytes([hdr[5] | 0x80]) + bytes(
        [(new_len >> s) & 0x7F for s in (21, 14, 7, 0)]
    )
    assert id3_frames(new_hdr + unsynced + rest) == [("title", "Song\xff A")]


def test_mp3_frame_walk_known_vector_and_edges():
    """Hand-worked spec check: MPEG1 Layer III, 128 kbps (index 9),
    44100 Hz (index 0) -> frame length floor(144*128000/44100) = 417
    bytes, 1152 samples/frame; 5 frames = floor(5760000/44100) = 130
    ms. Plus: ID3v2 skip, mid-stream truncation counts only complete
    frames, incoherent sync stops the chain, bare tags raise."""
    from toyocr_spark.multimodal import build_id3, build_mp3, mp3_frame_walk

    p = build_mp3(5, 9, 0)
    assert len(p) == 5 * 417
    assert mp3_frame_walk(p) == {
        "version": "1",
        "layer": 3,
        "sample_rate": 44100,
        "channel_mode": "stereo",
        "n_frames": 5,
        "duration_ms": 130,
        "avg_kbps": 128,
    }
    # MPEG2: 576 samples/frame, its own bitrate table (index 8 = 64)
    tagged = build_mp3(7, 8, 1, mpeg1=False, mono=True, id3=[("title", "x")])
    info = mp3_frame_walk(tagged)
    assert (info["sample_rate"], info["channel_mode"]) == (24000, "mono")
    assert info["duration_ms"] == 7 * 576 * 1000 // 24000
    assert info["avg_kbps"] == 64
    # truncation: cutting the last frame short keeps the first four
    assert mp3_frame_walk(p[: 5 * 417 - 1])["n_frames"] == 4
    # incoherent continuation (different sample rate) stops the chain
    other = build_mp3(1, 9, 2)
    assert mp3_frame_walk(p + other)["n_frames"] == 5
    # a bare ID3 tag (fake truncated frame trailer) has no audio
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mp3_frame_walk(build_id3([("title", "y")]))
    with _pytest.raises(ValueError):
        mp3_frame_walk(b"\xff\xe2garbage")  # reserved version bits


def test_mp3_frame_walk_fuzz_deterministic():
    """Hostile bytes: the walker either returns a dict or raises
    ValueError — never anything else — and is bit-deterministic."""
    import random

    from toyocr_spark.multimodal import build_mp3, mp3_frame_walk

    rng = random.Random(123987)
    base = build_mp3(4, 5, 1, mpeg1=True)
    for trial in range(300):
        buf = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        mutated = bytes(buf)

        def run(b=mutated):
            try:
                return ("ok", tuple(sorted(mp3_frame_walk(b).items())))
            except ValueError as e:
                return ("err", str(e))

        assert run() == run()


def test_media_metadata_unifies_id3_and_frame_walk(spark):
    """One MP3 payload yields BOTH tag rows and frame-walk rows from
    media_metadata; a bare (untagged) stream yields frame rows only."""
    from toyocr_spark.multimodal import build_mp3, media_metadata

    rows = media_metadata(
        spark.createDataFrame(
            [
                (1, build_mp3(5, 9, 0, id3=[("title", "Song A")])),
                (2, build_mp3(3, 8, 1, mpeg1=False, mono=True)),
            ],
            "media_id long, payload binary",
        )
    ).collect()
    got = {(r["media_id"], r["meta_key"]): r["meta_value"] for r in rows}
    assert got[(1, "title")] == "Song A"
    assert got[(1, "duration_ms")] == str(5 * 1152 * 1000 // 44100)
    assert got[(1, "channel_mode")] == "stereo"
    assert got[(2, "duration_ms")] == str(3 * 576 * 1000 // 24000)
    assert (2, "title") not in got
    assert all(r["fmt"] == "mp3" for r in rows)


def test_jpeg_lossless_decode_byte_identical():
    """SOF3 lossless JPEG (T.81 Annex H): the decoder must reproduce
    the encoder's input raster BYTE-IDENTICALLY for every predictor
    selector (1-7), grayscale and RGB, random and gradient content —
    exactness is the process's defining property, so any slip in the
    prediction/extend/modulo arithmetic fails loudly here."""
    import random

    from toyocr_spark.jpegcodec import decode_baseline, encode_lossless

    rng = random.Random(77)
    for ch in (1, 3):
        for pred in range(1, 8):
            w, h = rng.randint(3, 33), rng.randint(3, 33)
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            enc = encode_lossless(px, w, h, ch, predictor=pred)
            assert enc[:2] == b"\xff\xd8" and b"\xff\xc3" in enc[:64]
            dw, dh, dc, raster = decode_baseline(enc)
            assert (dw, dh, dc) == (w, h, ch) and raster == px, (ch, pred)
    # smooth gradient: small diffs, the realistic predictive case
    w, h = 64, 48
    px = bytes(((3 * x + 2 * y) // 4) & 0xFF for y in range(h) for x in range(w))
    assert decode_baseline(encode_lossless(px, w, h, 1, predictor=7))[3] == px


def test_jpeg_lossless_scan_order_independent():
    """A conformant SOF3 file may list SOS components in any order
    (T.81 places no constraint); the decoder must scatter samples by
    FRAME index, not scan position — a reordered scan decodes to the
    exact same raster as the frame-order twin (round-4 ADVICE: the old
    tabs.sort() silently mis-assigned channels)."""
    import itertools
    import random

    from toyocr_spark.jpegcodec import decode_baseline, encode_lossless

    rng = random.Random(4242)
    w, h = 17, 11
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    for order in itertools.permutations(range(3)):
        enc = encode_lossless(px, w, h, 3, predictor=4, scan_order=order)
        dw, dh, dc, raster = decode_baseline(enc)
        assert (dw, dh, dc) == (w, h, 3) and raster == px, order


def test_jpeg_lossless_fuzz_deterministic():
    """Bit-flipped lossless files decode deterministically or reject
    with ValueError — the fuzz discipline every codec carries."""
    import random

    from toyocr_spark.jpegcodec import decode_baseline, encode_lossless

    rng = random.Random(901)
    base = encode_lossless(
        bytes(rng.randrange(256) for _ in range(24 * 18 * 3)), 24, 18, 3
    )
    for _ in range(60):
        blob = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        payload = bytes(blob)
        try:
            first = decode_baseline(payload)
        except ValueError:
            try:
                decode_baseline(payload)
            except ValueError:
                continue
            raise AssertionError("nondeterministic rejection")
        assert decode_baseline(payload) == first


def test_djvu_info_known_answer_raw_bytes():
    """Hand-written single-page DjVu image (never via build_djvu) pins
    the INFO layout including the spec's endianness quirk: width and
    height are BIG-endian but dpi is LITTLE-endian. A walker and an
    encoder sharing a flipped-endian bug would agree with each other;
    they cannot agree with these literal bytes."""
    from toyocr_spark.multimodal import djvu_info

    # FORM length 22 = 'DJVU'(4) + 'INFO'(4) + len(4) + payload(10)
    raw = (
        b"AT&TFORM" + (22).to_bytes(4, "big") + b"DJVU"
        + b"INFO" + (10).to_bytes(4, "big")
        # width 0x0140=320 BE, height 0x00F0=240 BE, ver 24/3,
        # dpi 300 LE = 0x2C 0x01, gamma, flags
        + b"\x01\x40\x00\xf0\x18\x03\x2c\x01\x16\x01"
    )
    info = djvu_info(raw)
    assert info == {
        "kind": "single", "n_pages": 1, "width": 320, "height": 240, "dpi": 300,
    }
    # a big-endian dpi read would report 0x2C01 = 11265, not 300
    assert info["dpi"] != 11265


def test_djvu_bundled_walk_and_quiet_skip():
    from toyocr_spark.multimodal import build_djvu, djvu_info

    b = build_djvu([(200, 300, 600), (201, 301, 600)], bundled=True)
    info = djvu_info(b)
    assert info["kind"] == "bundled" and info["n_pages"] == 2
    assert (info["width"], info["height"], info["dpi"]) == (200, 300, 600)
    # truncation anywhere -> None, never a partial answer
    for cut in (4, 12, 20, len(b) - 3):
        assert djvu_info(b[:cut]) is None
    assert djvu_info(b"PK\x03\x04 not djvu") is None
    # odd-length chunk padding: a 3-byte opaque chunk before the page
    # forms must not desync the walk
    pad_chunk = b"ANTa" + (3).to_bytes(4, "big") + b"xyz" + b"\x00"
    body = b"DJVM" + pad_chunk + build_djvu([(50, 60, 300)], bundled=False)[12:]
    raw = b"AT&TFORM" + len(body).to_bytes(4, "big") + body
    # the single-page FORM re-wrapped inside DJVM: starts with 'DJVU'
    # at its payload, so rebuild as a FORM chunk
    inner = build_djvu([(50, 60, 300)], bundled=False)
    form = b"FORM" + (len(inner) - 12).to_bytes(4, "big") + inner[12:]
    body = b"DJVM" + pad_chunk + form
    raw = b"AT&TFORM" + len(body).to_bytes(4, "big") + body
    info = djvu_info(raw)
    assert info is not None and info["n_pages"] == 1 and info["width"] == 50


def test_jpeg_bitreader_lut_matches_spec_walk():
    """The 8-bit Huffman LUT fast path must agree with the spec's
    sequential per-bit walk for every code length (incl. codes longer
    than the LUT width) and leave identical reader state — including at
    truncation and across 0xFF00 byte stuffing."""
    from toyocr_spark.jpegcodec import _BitReader, _Huff

    # canonical table with lengths 1..16: symbol per length, so codes
    # 9..16 bits exercise the LUT-miss fallback
    counts = [1] * 16
    symbols = bytes(range(16))
    table = _Huff(counts, symbols)

    def spec_decode(reader):  # the pre-LUT reference walk
        code = 0
        for length in range(1, table.maxlen + 1):
            b = reader.bit()
            if b is None:
                return None
            code = (code << 1) | b
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid")

    import random

    rng = random.Random(99)
    for trial in range(300):
        n = rng.randrange(0, 24)
        data = bytes(rng.randrange(256) for _ in range(n))
        # stuff 0xFF bytes so the stream stays marker-free
        stuffed = bytearray()
        for c in data:
            stuffed.append(c)
            if c == 0xFF:
                stuffed.append(0x00)
        payload = bytes(stuffed)
        ra, rb = _BitReader(payload, 0), _BitReader(payload, 0)
        while True:
            sa = rb_state = None
            try:
                sa = ra.decode(table)
            except ValueError:
                sa = "invalid"
            try:
                sb = spec_decode(rb)
            except ValueError:
                sb = "invalid"
            assert sa == sb
            assert (ra.i, ra.nbits) == (rb.i, rb.nbits)
            if sa is None or sa == "invalid":
                break


def test_jpeg_bitreader_bulk_bits_matches_sequential():
    """bits(n) must return the same value and leave the same reader
    state as n sequential bit() calls, incl. the consumed-tail state on
    truncation."""
    from toyocr_spark.jpegcodec import _BitReader

    import random

    rng = random.Random(7)
    for _ in range(300):
        payload = bytes(rng.randrange(255) for _ in range(rng.randrange(0, 6)))
        for n in (1, 3, 8, 11, 16):
            ra, rb = _BitReader(payload, 0), _BitReader(payload, 0)
            va = ra.bits(n)
            vb = 0
            for _k in range(n):
                b = rb.bit()
                if b is None:
                    vb = None
                    break
                vb = (vb << 1) | b
            assert va == vb
            assert (ra.i, ra.nbits) == (rb.i, rb.nbits)

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
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        parse_header(b"\x89PNG\r\n\x1a\n....")


def test_decode_partitioned_plan_has_no_extra_shuffle(spark):
    """decode is a map-only stage: repartitioned input must reach the
    UDF without another exchange."""
    media = synth_media(_docs(spark)).repartition(4, "media_id")
    plan = decode_media(media)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # only the explicit repartition

"""ARC container source (sources/arc.py): raw-byte known-answer pins
(hand-written file images, independent of build_arc, so the
builder/parser pair cannot share a layout bug), roundtrips across both
header versions and the gzip envelope, and container-agnostic identity
through the extraction kernel."""

from __future__ import annotations

import gzip

from toyocr_spark.sources.arc import build_arc, parse_arc, read_arc, write_arc

# hand-written ARC v1 file image: filedesc (72-byte version block),
# one html capture whose http block must be stripped, one gif capture
# the mime filter must drop, one pdf capture admitted by magic-free
# header type. Lengths counted by hand.
_V1_RAW = (
    b"filedesc://x.arc 0.0.0.0 20080101000000 text/plain 72\n"
    b"1 0 ToyocrSpark\n"
    b"URL IP-address Archive-date Content-type Archive-length\n"
    b"\n"
    b"http://a.example/p 1.2.3.4 20080102030405 text/html 46\n"
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nhi"
    b"\n"
    b"http://a.example/i.gif 1.2.3.4 20080102030406 image/gif 3\n"
    b"GIF"
    b"\n"
    b"http://a.example/d.pdf 1.2.3.4 20080102030407 application/pdf 9\n"
    b"%PDF-1.4 "
    b"\n"
)


def test_parse_arc_v1_known_answer():
    recs = parse_arc(_V1_RAW)
    assert [r["url"] for r in recs] == [
        "http://a.example/p",
        "http://a.example/d.pdf",
    ]
    assert recs[0]["html"] == b"hi"
    assert recs[0]["arc_ts"] == "20080102030405"
    # offset/length address the record in the decompressed stream
    start, ln = recs[0]["offset"], recs[0]["length"]
    assert _V1_RAW[start : start + ln].startswith(b"http://a.example/p ")
    # pdf body is NOT http-wrapped here: passes through verbatim
    assert recs[1]["html"] == b"%PDF-1.4 "


def test_parse_arc_v2_and_bare_lf_http():
    # 10-field v2 header line; old-ARC bare-LF http separator
    raw = (
        b"filedesc://y.arc 0.0.0.0 20080101000000 text/plain 4\n"
        b"2 0\n"
        b"\n"
        b"http://b.example/q 1.2.3.4 20090102030405 text/html 200 - - 0 y.arc 44\n"
        b"HTTP/1.0 200 OK\nContent-Type: text/html\n\nok!"
        b"\n"
    )
    recs = parse_arc(raw)
    assert len(recs) == 1
    assert recs[0]["url"] == "http://b.example/q"
    assert recs[0]["html"] == b"ok!"


def test_parse_arc_truncated_and_malformed_stop():
    # declared length overruns the file: no partial record emitted
    raw = b"http://c.example/r 1.2.3.4 20080102030405 text/html 999\nshort"
    assert parse_arc(raw) == []
    # malformed header (wrong field count) stops the walk cleanly
    head = parse_arc(_V1_RAW + b"not a header line\n")
    assert [r["url"] for r in head] == [
        "http://a.example/p",
        "http://a.example/d.pdf",
    ]


def test_build_parse_roundtrip_both_versions():
    records = [
        ("http://r.example/1", "20080201000000", b"<html><p>one</p></html>"),
        ("http://r.example/2", "20080201000001", b"%PDF-1.4 fake"),
        ("http://r.example/3.gif", "20080201000002", b"GIF89a", "image/gif"),
    ]
    for v in (1, 2):
        recs = parse_arc(build_arc(records, version=v))
        assert [r["url"] for r in recs] == [
            "http://r.example/1",
            "http://r.example/2",
        ]
        assert recs[0]["html"] == records[0][2]
        assert recs[1]["html"] == records[1][2]
    # whole-file gzip envelope
    recs = parse_arc(gzip.compress(build_arc(records)))
    assert len(recs) == 2


def test_read_arc_pages_and_extraction_identity(spark, tmp_path):
    """ARC-ingested pages must extract byte-identically to the same
    html fed straight into the kernel — the container is transparent
    (the read_warc contract, here for the pre-WARC sibling)."""
    from pyspark.sql import functions as F

    from toyocr_spark.pipeline import extract_pages

    html = [
        (
            f"https://cc-{i}.example/p{i}",
            f"200802010000{i:02d}",
            (
                "<html><body><nav><a href='/x'>nav link</a></nav>"
                f"<article><p>arc body paragraph {i} with enough prose "
                "to clear the keep thresholds of the scorer, words and "
                "words and words.</p></article></body></html>"
            ).encode(),
        )
        for i in range(6)
    ]
    write_arc(str(tmp_path / "a.arc"), html[:3], version=1)
    write_arc(str(tmp_path / "b.arc.gz"), html[3:], version=2, compress=True)

    pages = read_arc(spark, str(tmp_path / "*.arc*"))
    rows = {r.url: r for r in pages.collect()}
    assert len(rows) == 6
    assert rows["https://cc-0.example/p0"].warc_ts is not None

    via_arc = {
        r.url: r.extracted_text for r in extract_pages(pages).collect()
    }
    direct_df = spark.createDataFrame(
        [(u, h) for u, _ts, h in html], "url string, html binary"
    ).select("url", F.col("html"))
    via_direct = {
        r.url: r.extracted_text for r in extract_pages(direct_df).collect()
    }
    assert via_arc == via_direct
    assert all(f"arc body paragraph {i}" in via_arc[f"https://cc-{i}.example/p{i}"] for i in range(6))


def test_truncated_gzip_envelope_quiet_skip():
    """A cut-short .arc.gz must parse to zero records, not raise — one
    bad shard cannot be allowed to kill a whole ingest task."""
    blob = gzip.compress(
        build_arc([("http://t.example/1", "20080201000000", b"<p>x</p>")])
    )
    for cut in (4, 10, len(blob) // 2, len(blob) - 2):
        assert parse_arc(blob[:cut]) == []


def test_arc_cdx_roundtrip(spark, tmp_path):
    """ARC -> CDX -> range-fetch: the pre-WARC container gets the same
    index treatment as WARC (same provenance column names, one index
    schema over mixed crawls), and a cdx row's (file, offset, length)
    range-reads the exact capture back out — including from the
    gzipped archive, whose offsets address the decompressed stream."""
    from toyocr_spark.sources.arc import fetch_arc_record, read_arc_members
    from toyocr_spark.sources.cdx import cdx_lookup, write_cdx

    records = [
        (
            f"https://arcdx-{i}.example/p{i}",
            f"200803010000{i:02d}",
            f"<html><body><p>capture body {i} text</p></body></html>".encode(),
        )
        for i in range(8)
    ]
    write_arc(str(tmp_path / "x.arc"), records[:4], version=1)
    write_arc(str(tmp_path / "y.arc.gz"), records[4:], version=2, compress=True)

    pages = read_arc_members(spark, str(tmp_path / "*.arc*"))
    assert pages.count() == 8
    out = str(tmp_path / "cdx")
    summary = write_cdx(
        pages, out, shards=2,
        keep_cols=("warc_file", "warc_offset", "warc_length"),
    )
    assert summary["rows"] == 8

    hits = cdx_lookup(spark, out, "example,arcdx-6)").collect()
    assert len(hits) == 1
    h = hits[0]
    rec = fetch_arc_record(h.warc_file, h.warc_offset, h.warc_length)
    assert rec is not None
    assert rec["url"] == "https://arcdx-6.example/p6"
    assert b"capture body 6 text" in rec["html"]

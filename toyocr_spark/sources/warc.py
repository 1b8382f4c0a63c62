"""WARC source — reading Common-Crawl-native archives into the pages
schema.

A crawl's native at-rest format is WARC (ISO 28500): a concatenation of
records, each a header block (CRLF-separated ``Name: value`` lines,
preceded by ``WARC/1.0``) + CRLF CRLF + a body of exactly
``Content-Length`` bytes + CRLF CRLF. Common Crawl ships one ~1 GB
``.warc.gz`` per segment, gzipped per-record so the file is seekable —
but whole-file gzip also decompresses fine with a streaming reader.

Parallelism model: the FILE is the unit of work (as on Common Crawl:
~80k segment files per crawl → ~80k tasks), read via Spark's
``binaryFile`` source and parsed by a vectorized mapInArrow UDF. No
driver-side I/O, no Python per-row work outside the batch parser.
This is the graft of the reference's dataset loaders normalizing an
external container format into dataset dicts
(/root/reference/data/dataset/coco_text.py:14-80, and the
icdar_converter's file-format fan-out,
/root/reference/tools/icdar_converter.py:16-149).

Only ``response`` records with an http Content-Type of text/html or
application/pdf (or a missing type) become pages; the http header block
inside the body is stripped. PDF bodies ride the same binary ``html``
column — the extraction kernel dispatches on the %PDF- magic.
Everything is deterministic: ordering follows (file, offset).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from toyocr_spark.sources.pages import PAGES_SCHEMA

_CRLF = b"\r\n"


def parse_warc(raw: bytes, types: tuple[str, ...] = ("response",)) -> list[dict]:
    """Parse one WARC file's bytes (gzipped or plain) into record dicts
    ``{url, warc_ts, html}``. Pure function; tolerant of trailing
    garbage (stops at the first malformed record boundary). ``types``
    selects the admitted WARC-Type values: ``response`` for crawl
    archives (the default), ``conversion`` for WET sidecars (whose
    bodies are extracted text, no http header block)."""
    if raw[:2] == b"\x1f\x8b":
        # member-per-record or whole-file gzip: a streaming reader
        # handles both (multi-member decompression is the gzip default)
        raw = gzip.decompress(raw)
    out: list[dict] = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record blank lines
        while raw.startswith(_CRLF, pos):
            pos += 2
        rec_start = pos
        if not raw.startswith(b"WARC/", pos):
            break
        hdr_end = raw.find(_CRLF + _CRLF, pos)
        if hdr_end == -1:
            break
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        body = raw[body_start : body_start + length]
        pos = body_start + length
        if (
            headers.get("warc-type") in types
            and headers.get("warc-target-uri")
        ):
            # strip the http response header block if present
            html = body
            if body[:5] == b"HTTP/":
                he = body.find(_CRLF + _CRLF)
                if he == -1:
                    # malformed http block (no header terminator): skip
                    # the record rather than emit a bogus empty page
                    continue
                http_hdr = body[:he].lower()
                html = body[he + 4 :]
                if (
                    b"content-type" in http_hdr
                    and b"text/html" not in http_hdr
                    and b"application/pdf" not in http_hdr
                ):
                    continue  # neither html nor pdf: skip the record
                # (PDF responses flow through the same `html` byte
                # column; the kernel dispatches on the %PDF- magic)
            out.append(
                {
                    "url": headers["warc-target-uri"],
                    "warc_ts": headers.get("warc-date", ""),
                    "html": html,
                    # provenance in the DECOMPRESSED stream (this parser
                    # inflates whole files; a compressed-member layout
                    # would record member offsets instead): enough for
                    # fetch_warc_record to range-read one record
                    "offset": rec_start,
                    "length": pos - rec_start,
                }
            )
    return out


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """``.warc`` / ``.warc.gz`` files -> pages DataFrame (text=NULL,
    lang=NULL — downstream jobs fill them). One Spark task per file."""
    import pyarrow as pa

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in it:
            urls: list[str] = []
            tss: list[str] = []
            htmls: list[bytes] = []
            for content in b.column(1).to_pylist():
                for rec in parse_warc(content):
                    urls.append(rec["url"])
                    tss.append(rec["warc_ts"])
                    htmls.append(rec["html"])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(tss, pa.string()),
                    pa.array(htmls, pa.binary()),
                ],
                names=["url", "warc_ts_raw", "html"],
            )

    schema = "url string, warc_ts_raw string, html binary"
    rows = files.mapInArrow(batches, schema)
    return rows.select(
        "url",
        F.to_timestamp(F.col("warc_ts_raw")).alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def read_warc_members(spark: SparkSession, path_glob: str) -> DataFrame:
    """read_warc plus capture provenance: (url, warc_ts, html,
    warc_file, warc_offset, warc_length) — the columns a CDX index
    needs to make every capture range-addressable back into its WARC.
    Offsets are positions in the decompressed record stream (this
    parser inflates whole files); fetch_warc_record consumes them."""
    import pyarrow as pa

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in it:
            paths = b.column(0).to_pylist()
            urls: list[str] = []
            tss: list[str] = []
            htmls: list[bytes] = []
            wfiles: list[str] = []
            offs: list[int] = []
            lens: list[int] = []
            for path, content in zip(paths, b.column(1).to_pylist()):
                for rec in parse_warc(content):
                    urls.append(rec["url"])
                    tss.append(rec["warc_ts"])
                    htmls.append(rec["html"])
                    wfiles.append(path)
                    offs.append(rec["offset"])
                    lens.append(rec["length"])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(tss, pa.string()),
                    pa.array(htmls, pa.binary()),
                    pa.array(wfiles, pa.string()),
                    pa.array(offs, pa.int64()),
                    pa.array(lens, pa.int64()),
                ],
                names=[
                    "url", "warc_ts_raw", "html",
                    "warc_file", "warc_offset", "warc_length",
                ],
            )

    schema = (
        "url string, warc_ts_raw string, html binary, "
        "warc_file string, warc_offset long, warc_length long"
    )
    rows = files.mapInArrow(batches, schema)
    return rows.select(
        "url",
        F.to_timestamp(F.col("warc_ts_raw")).alias("warc_ts"),
        "html",
        "warc_file",
        "warc_offset",
        "warc_length",
    )


def fetch_warc_record(path: str, offset: int, length: int) -> dict | None:
    """Point fetch: read ONE record's byte range out of a WARC file
    (gzip files are inflated first — offsets are decompressed-stream
    positions) and parse just that slice. The consumer side of the
    CDX provenance columns: a 100 TB crawl is point-addressable
    without scanning anything but the index."""
    with open(path.removeprefix("file:"), "rb") as f:
        raw = f.read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    recs = parse_warc(raw[offset : offset + length], types=("response", "conversion"))
    return recs[0] if recs else None


# ------------------------------------------------------ WET export sink


def wet_segments(
    result: DataFrame, segments: int = 16, ts_col: str | None = None
) -> DataFrame:
    """Extraction results (url, extracted_text, ...) -> one row per WET
    segment: ``(segment, n_records, wet binary)`` where ``wet`` is the
    concatenation of WARC *conversion* records — Common Crawl's WET
    sidecar, the standard at-rest form of extracted text.

    The record bytes are assembled ENTIRELY JVM-side (concat/encode/
    octet_length — Content-Length is the UTF-8 octet count of the
    text, never a Python serializer), records are routed to segments
    by url-hash and ordered by url inside each segment, and the
    array-of-records is folded to one binary with F.aggregate. Fully
    deterministic: same results -> byte-identical segments on any
    engine or partitioning.

    Scale shape: one shuffle on the segment key; ``segments`` sets the
    output-file granularity exactly like Common Crawl's ~80k WET files
    per crawl (pick segments ~= corpus_bytes / 1 GB). A segment's
    bytes materialize as ONE row, so segments must be sized to fit an
    executor — the same constraint as any archive writer."""
    text = F.coalesce(F.col("extracted_text"), F.lit(""))
    body = F.encode(text, "UTF-8")
    ts = (
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        if ts_col
        else F.lit("1970-01-01T00:00:00Z")
    )
    rec = F.concat(
        F.encode(
            F.concat_ws(
                "\r\n",
                F.lit("WARC/1.0"),
                F.lit("WARC-Type: conversion"),
                F.concat(F.lit("WARC-Target-URI: "), F.col("url")),
                F.concat(F.lit("WARC-Date: "), ts),
                F.lit("Content-Type: text/plain"),
                F.concat(
                    F.lit("Content-Length: "),
                    F.octet_length(body).cast("string"),
                ),
                F.lit("\r\n"),  # header terminator (joined -> CRLF CRLF)
            ),
            "UTF-8",
        ),
        body,
        F.encode(F.lit("\r\n\r\n"), "UTF-8"),
    )
    keyed = result.select(
        F.pmod(F.xxhash64("url"), F.lit(segments)).alias("segment"),
        F.col("url"),
        rec.alias("rec"),
    )
    return keyed.groupBy("segment").agg(
        F.count("*").alias("n_records"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("url", "rec"))),
                lambda x: x["rec"],
            ),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x),
        ).alias("wet"),
    )


def _write_segments(
    seg_df: DataFrame, out_dir: str, prefix: str, data_col: str, compress: bool
) -> list[str]:
    """Shared segment committer for the WET/WAT sinks: segments stream
    through the driver one at a time (toLocalIterator) — the demo-scale
    committer; on a real cluster the same rows would be written
    executor-side by a foreachPartition committer against the object
    store. Gzip uses mtime=0 so re-running produces byte-identical
    files."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    suffix = f".warc.{prefix}.gz" if compress else f".warc.{prefix}"
    for row in seg_df.toLocalIterator():
        data = bytes(row[data_col])
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(data)
            data = buf.getvalue()
        path = os.path.join(out_dir, f"{prefix}-{row['segment']:05d}{suffix}")
        with open(path, "wb") as f:
            f.write(data)
        paths.append(path)
    return sorted(paths)


def write_wet(
    result: DataFrame, out_dir: str, segments: int = 16, compress: bool = True
) -> list[str]:
    """Materialize ``wet_segments`` as ``wet-{segment:05d}.warc.wet[.gz]``
    files under ``out_dir`` (committer contract: ``_write_segments``)."""
    return _write_segments(
        wet_segments(result, segments), out_dir, "wet", "wet", compress
    )


def wat_segments(
    result: DataFrame,
    edges: DataFrame | None = None,
    segments: int = 16,
    ts_col: str | None = None,
) -> DataFrame:
    """Extraction results (+ optional ``(src_url, target)`` outlink
    edges from ``linkmine.mine_outlinks``) -> one row per WAT segment:
    ``(segment, n_records, wat binary)`` where ``wat`` is the
    concatenation of WARC *metadata* records carrying a JSON envelope
    per url — Common Crawl's WAT sidecar (title, outlinks, extraction
    metadata), completing the artifact trio next to WET and CDX.

    The JSON is built ENTIRELY JVM-side with to_json over a fixed
    struct (field order is the struct's, never a dict's), the title is
    the first 'title' span sliced out of extracted_text by the span
    offsets, links are sorted for determinism, and record bytes
    assemble exactly like wet_segments (octet-exact Content-Length).
    Fully deterministic: same inputs -> byte-identical segments.

    Scale shape: one left join on url (edges pre-collapsed per url by
    a partial agg) + one shuffle on the segment key — the same
    two-Exchange budget as the WET sink plus the edge join."""
    spans = F.col("spans")
    tspan = F.try_element_at(
        F.filter(spans, lambda s: s["kind"] == F.lit("title")), F.lit(1)
    )
    title = F.when(
        tspan.isNotNull(),
        F.substring(
            F.col("extracted_text"),
            (tspan["start"] + 1).cast("int"),
            (tspan["end"] - tspan["start"]).cast("int"),
        ),
    )
    base = result.select(
        "url",
        title.alias("_title"),
        F.col("n_blocks"),
        F.col("n_kept"),
        F.col("truncated"),
        *([F.col(ts_col).alias("_ts")] if ts_col else []),
    )
    if edges is not None:
        per_url = edges.groupBy(F.col("src_url").alias("url")).agg(
            F.array_sort(F.collect_list("target")).alias("_links")
        )
        base = base.join(per_url, "url", "left")
    else:
        base = base.withColumn("_links", F.lit(None).cast("array<string>"))
    envelope = F.to_json(
        F.struct(
            F.struct(
                F.struct(
                    F.struct(
                        F.struct(F.col("_title").alias("Title")).alias("Head"),
                        F.transform(
                            F.coalesce(
                                F.col("_links"), F.array().cast("array<string>")
                            ),
                            lambda u: F.struct(u.alias("url")),
                        ).alias("Links"),
                    ).alias("HTML-Metadata"),
                    F.struct(
                        F.col("n_blocks").alias("Blocks"),
                        F.col("n_kept").alias("Kept-Blocks"),
                        F.col("truncated").alias("Truncated"),
                    ).alias("Extraction-Metadata"),
                ).alias("Payload-Metadata")
            ).alias("Envelope")
        )
    )
    body = F.encode(envelope, "UTF-8")
    ts = (
        F.date_format(F.col("_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        if ts_col
        else F.lit("1970-01-01T00:00:00Z")
    )
    rec = F.concat(
        F.encode(
            F.concat_ws(
                "\r\n",
                F.lit("WARC/1.0"),
                F.lit("WARC-Type: metadata"),
                F.concat(F.lit("WARC-Target-URI: "), F.col("url")),
                F.concat(F.lit("WARC-Date: "), ts),
                F.lit("Content-Type: application/json"),
                F.concat(
                    F.lit("Content-Length: "),
                    F.octet_length(body).cast("string"),
                ),
                F.lit("\r\n"),
            ),
            "UTF-8",
        ),
        body,
        F.encode(F.lit("\r\n\r\n"), "UTF-8"),
    )
    keyed = base.select(
        F.pmod(F.xxhash64("url"), F.lit(segments)).alias("segment"),
        F.col("url"),
        rec.alias("rec"),
    )
    return keyed.groupBy("segment").agg(
        F.count("*").alias("n_records"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("url", "rec"))),
                lambda x: x["rec"],
            ),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x),
        ).alias("wat"),
    )


def write_wat(
    result: DataFrame,
    out_dir: str,
    edges: DataFrame | None = None,
    segments: int = 16,
    compress: bool = True,
) -> list[str]:
    """Materialize ``wat_segments`` as ``wat-{segment:05d}.warc.wat[.gz]``
    files under ``out_dir`` (committer contract: ``_write_segments``)."""
    return _write_segments(
        wat_segments(result, edges, segments), out_dir, "wat", "wat", compress
    )


# ------------------------------------------------------ fixture writer


def write_warc(path: str, records: list[tuple[str, str, bytes]], compress: bool = False) -> None:
    """Serialize (url, iso_ts, html) triples as a WARC file — the
    inverse serializer (S8 shape) used by tests and fixture generation."""
    buf = io.BytesIO()
    for url, ts, html in records:
        ctype = b"application/pdf" if html[:5] == b"%PDF-" else b"text/html"
        body = b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + html
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(body)}\r\n"
        ).encode("latin-1")
        buf.write(hdr + _CRLF + body + _CRLF + _CRLF)
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)


def parse_warc_http_meta(raw: bytes) -> list[dict]:
    """Crawl-health view of a WARC file: EVERY response record's HTTP
    envelope — status code, Content-Type (parameters stripped), body
    length — including the records parse_warc filters out (redirects,
    404s, images, robots bodies...). Same tolerant record walk, no
    body decoding at all: health profiling over petabytes of WARC
    must not pay the content cost."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    out: list[dict] = []
    pos = 0
    n = len(raw)
    while pos < n:
        while raw.startswith(_CRLF, pos):
            pos += 2
        if not raw.startswith(b"WARC/", pos):
            break
        hdr_end = raw.find(_CRLF + _CRLF, pos)
        if hdr_end == -1:
            break
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        body = raw[body_start : body_start + length]
        pos = body_start + length
        if headers.get("warc-type") != "response" or not headers.get(
            "warc-target-uri"
        ):
            continue
        status, ctype, body_len = 0, "", len(body)
        if body[:5] == b"HTTP/":
            he = body.find(_CRLF + _CRLF)
            if he == -1:
                continue
            lines = body[:he].split(_CRLF)
            parts = lines[0].split(b" ", 2)
            try:
                status = int(parts[1]) if len(parts) > 1 else 0
            except ValueError:
                status = 0
            for line in lines[1:]:
                k, _, v = line.partition(b":")
                if k.strip().lower() == b"content-type":
                    ctype = (
                        v.strip().split(b";", 1)[0].strip().lower().decode("latin-1")
                    )
                    break
            body_len = len(body) - he - 4
        out.append(
            {
                "url": headers["warc-target-uri"],
                "warc_ts": headers.get("warc-date", ""),
                "http_status": status,
                "content_type": ctype,
                "content_length": body_len,
            }
        )
    return out


def read_warc_http_meta(spark: SparkSession, path_glob: str) -> DataFrame:
    """(url, warc_ts, http_status, content_type, content_length) for
    every response record — the input to crawl-health reports (status
    distribution per host, MIME mix, redirect chains). Map-only; one
    task per file; nothing but the HTTP envelope leaves the reader."""
    import pyarrow as pa

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in it:
            cols: list[list] = [[], [], [], [], []]
            for content in b.column(1).to_pylist():
                for rec in parse_warc_http_meta(content):
                    cols[0].append(rec["url"])
                    cols[1].append(rec["warc_ts"])
                    cols[2].append(rec["http_status"])
                    cols[3].append(rec["content_type"])
                    cols[4].append(rec["content_length"])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], pa.string()),
                    pa.array(cols[1], pa.string()),
                    pa.array(cols[2], pa.int32()),
                    pa.array(cols[3], pa.string()),
                    pa.array(cols[4], pa.int64()),
                ],
                names=["url", "warc_ts_raw", "http_status", "content_type", "content_length"],
            )

    schema = (
        "url string, warc_ts_raw string, http_status int, "
        "content_type string, content_length long"
    )
    rows = files.mapInArrow(batches, schema)
    return rows.select(
        "url",
        F.to_timestamp(F.col("warc_ts_raw")).alias("warc_ts"),
        "http_status",
        "content_type",
        "content_length",
    )

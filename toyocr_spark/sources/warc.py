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


def parse_warc(raw: bytes) -> list[dict]:
    """Parse one WARC file's bytes (gzipped or plain) into record dicts
    ``{url, warc_ts, html}``. Pure function; tolerant of trailing
    garbage (stops at the first malformed record boundary)."""
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
            headers.get("warc-type") == "response"
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

"""ARC source — the Internet Archive's pre-WARC container (ARC 1.x/2.x),
the at-rest format of early web corpora (Common Crawl 2008-2012, the
Wayback Machine's first decade). A real 10^12-doc ingest meets both
containers side by side, so ARC gets the same treatment as WARC: file
as the unit of work, vectorized batch parser, records normalized into
the pages schema.

Layout (ARC file format spec, v1): a ``filedesc://`` record first — a
space-delimited header line ``URL IP-address Archive-date Content-type
Archive-length`` whose body is the version block (``1 0 Organization``
+ the field-name line) — then one record per capture: the same
5-field header line, ``\\n``, exactly Archive-length payload bytes,
``\\n``. Version 2 headers carry 10 fields (adding result-code,
checksum, location, offset, filename); both versions put URL first,
date third, content-type fourth and length LAST, so one parse handles
both. HTTP captures embed the full response (status line + headers +
body), stripped here exactly like the WARC path. Graft of the
reference's multi-container dataset fan-out
(/root/reference/tools/icdar_converter.py:16-149, the per-format
loader dispatch).

Everything is deterministic: ordering follows (file, offset); offsets
index the DECOMPRESSED stream (whole-file .arc.gz inflates first,
matching the WARC reader's contract).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LF = b"\n"
_ADMIT_MIME = ("text/html", "application/pdf")


def parse_arc(raw: bytes, mimes: tuple[str, ...] = _ADMIT_MIME) -> list[dict]:
    """Parse one ARC file's bytes (plain or whole-file gzip) into
    record dicts ``{url, arc_ts, html, offset, length}``. Pure
    function; tolerant of trailing garbage (stops at the first
    malformed record boundary). ``mimes`` selects admitted
    content-types by prefix match on the HEADER-LINE type (the http
    block inside the payload is stripped but never re-filtered — the
    ARC header's type is authoritative, as in the CDX convention)."""
    if raw[:2] == b"\x1f\x8b":
        try:
            raw = gzip.decompress(raw)
        except (OSError, EOFError):
            # truncated/corrupt envelope: the gzip magic is unforgeable,
            # so this was an archive and it is unreadable — quiet skip
            # (the container contract; a raised error here would kill
            # the whole ingest task over one bad shard)
            return []
    out: list[dict] = []
    pos = 0
    n = len(raw)
    while pos < n:
        # records are separated by a single blank line; tolerate extras
        while pos < n and raw[pos : pos + 1] == _LF:
            pos += 1
        if pos >= n:
            break
        rec_start = pos
        hdr_end = raw.find(_LF, pos)
        if hdr_end == -1:
            break
        fields = raw[pos:hdr_end].split(b" ")
        # v1 = 5 fields, v2 = 10; URL first, date third, type fourth,
        # length always LAST — anything else is a malformed boundary
        if len(fields) not in (5, 10):
            break
        try:
            length = int(fields[-1])
        except ValueError:
            break
        body_start = hdr_end + 1
        if body_start + length > n:
            break  # truncated record: stop, never emit partial bytes
        body = raw[body_start : body_start + length]
        pos = body_start + length
        url = fields[0].decode("latin-1")
        mime = fields[3].decode("latin-1")
        if url.startswith("filedesc://"):
            continue  # the leading file-descriptor record: metadata only
        if not any(mime.startswith(m) for m in mimes):
            continue
        html = body
        if body[:5] == b"HTTP/":
            he = body.find(b"\r\n\r\n")
            sep = 4
            if he == -1:
                # bare-LF http blocks exist in old ARCs; accept both
                he = body.find(b"\n\n")
                sep = 2
            if he == -1:
                continue  # malformed http block: skip the record
            html = body[he + sep :]
        out.append(
            {
                "url": url,
                # 14-digit compact timestamp (yyyymmddhhmmss), the
                # ARC/CDX shared convention
                "arc_ts": fields[2].decode("latin-1"),
                "html": html,
                "offset": rec_start,
                "length": pos - rec_start,
            }
        )
    return out


def read_arc(spark: SparkSession, path_glob: str) -> DataFrame:
    """``.arc`` / ``.arc.gz`` files -> pages DataFrame (text=NULL,
    lang=NULL — downstream jobs fill them). One Spark task per file,
    the read_warc contract; the compact 14-digit ARC date parses into
    the same ``warc_ts`` timestamp column so every downstream operator
    (CDX, recrawl, snapshot delta) is container-agnostic."""
    import pyarrow as pa

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in it:
            urls: list[str] = []
            tss: list[str] = []
            htmls: list[bytes] = []
            for content in b.column(1).to_pylist():
                for rec in parse_arc(content):
                    urls.append(rec["url"])
                    tss.append(rec["arc_ts"])
                    htmls.append(rec["html"])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(tss, pa.string()),
                    pa.array(htmls, pa.binary()),
                ],
                names=["url", "arc_ts_raw", "html"],
            )

    schema = "url string, arc_ts_raw string, html binary"
    rows = files.mapInArrow(batches, schema)
    return rows.select(
        "url",
        F.to_timestamp(F.col("arc_ts_raw"), "yyyyMMddHHmmss").alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def build_arc(
    records: list[tuple],
    version: int = 1,
    filename: str = "fixture.arc",
) -> bytes:
    """Serialize (url, yyyymmddhhmmss, html[, content-type]) records as
    one ARC file's bytes — the inverse serializer (S8 shape) used by
    tests and fixture generation. ``version`` picks the 5-field (v1)
    or 10-field (v2) record header; an omitted content-type is
    inferred (application/pdf on the %PDF- magic, else text/html)."""
    buf = io.BytesIO()
    vblock = (
        f"{version} 0 ToyocrSpark\n"
        "URL IP-address Archive-date Content-type Archive-length\n"
    ).encode("latin-1")
    buf.write(
        f"filedesc://{filename} 0.0.0.0 20080101000000 text/plain {len(vblock)}\n".encode(
            "latin-1"
        )
    )
    buf.write(vblock + _LF)
    for rec in records:
        url, ts, html = rec[0], rec[1], rec[2]
        if len(rec) > 3:
            ctype = rec[3]
        else:
            ctype = "application/pdf" if html[:5] == b"%PDF-" else "text/html"
        body = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + ctype.encode("latin-1")
            + b"\r\n\r\n"
            + html
        )
        if version == 2:
            hdr = f"{url} 127.0.0.1 {ts} {ctype} 200 - - 0 {filename} {len(body)}\n"
        else:
            hdr = f"{url} 127.0.0.1 {ts} {ctype} {len(body)}\n"
        buf.write(hdr.encode("latin-1") + body + _LF)
    return buf.getvalue()


def write_arc(
    path: str,
    records: list[tuple],
    version: int = 1,
    compress: bool = False,
) -> None:
    """build_arc to a file, optionally whole-file gzipped (.arc.gz)."""
    data = build_arc(records, version=version, filename=path.rsplit("/", 1)[-1])
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)


def read_arc_members(spark: SparkSession, path_glob: str) -> DataFrame:
    """read_arc plus capture provenance: (url, warc_ts, html,
    warc_file, warc_offset, warc_length) — the SAME provenance column
    names the WARC reader emits, so the CDX builder's keep_cols path
    is container-agnostic (one index schema over mixed ARC+WARC
    crawls). Offsets index the decompressed stream, the read_warc
    contract; fetch_arc_record consumes them."""
    import pyarrow as pa

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in it:
            rows: list[tuple] = []
            for path, content in zip(
                b.column(0).to_pylist(), b.column(1).to_pylist()
            ):
                for rec in parse_arc(content):
                    rows.append(
                        (
                            rec["url"],
                            rec["arc_ts"],
                            rec["html"],
                            path,
                            rec["offset"],
                            rec["length"],
                        )
                    )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in rows], pa.string()),
                    pa.array([r[1] for r in rows], pa.string()),
                    pa.array([r[2] for r in rows], pa.binary()),
                    pa.array([r[3] for r in rows], pa.string()),
                    pa.array([r[4] for r in rows], pa.int64()),
                    pa.array([r[5] for r in rows], pa.int64()),
                ],
                names=[
                    "url",
                    "arc_ts_raw",
                    "html",
                    "warc_file",
                    "warc_offset",
                    "warc_length",
                ],
            )

    schema = (
        "url string, arc_ts_raw string, html binary, "
        "warc_file string, warc_offset long, warc_length long"
    )
    rows = files.mapInArrow(batches, schema)
    return rows.select(
        "url",
        F.to_timestamp(F.col("arc_ts_raw"), "yyyyMMddHHmmss").alias("warc_ts"),
        "html",
        "warc_file",
        "warc_offset",
        "warc_length",
    )


def fetch_arc_record(path: str, offset: int, length: int) -> dict | None:
    """Range-read ONE capture back out of its ARC by the provenance a
    CDX row carries (the fetch_warc_record twin). Offsets address the
    decompressed stream, so a .arc.gz inflates first; the record slice
    then re-parses through parse_arc with the filter relaxed (the
    header line's type was already admitted at index time)."""
    with open(path.removeprefix("file:"), "rb") as f:
        raw = f.read()
    if raw[:2] == b"\x1f\x8b":
        try:
            raw = gzip.decompress(raw)
        except (OSError, EOFError):
            return None
    recs = parse_arc(raw[offset : offset + length], mimes=("",))
    return recs[0] if recs else None

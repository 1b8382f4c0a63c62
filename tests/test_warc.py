"""WARC source: round-trip, gzip handling, non-html filtering, and the
full WARC -> extraction pipeline."""

from __future__ import annotations

import gzip
import os

import pytest

from toyocr_spark.fixtures.genpages import gen_pages
from toyocr_spark.pipeline import extract_pages
from toyocr_spark.sources.warc import parse_warc, read_warc, write_warc


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("warc"))
    # pdf_frac: application/pdf response records ride the same column
    pages = gen_pages(60, seed=77, pdf_frac=0.2)
    recs = [
        (p.url, p.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"), p.html) for p in pages
    ]
    write_warc(os.path.join(d, "seg-0.warc"), recs[:30])
    write_warc(os.path.join(d, "seg-1.warc.gz"), recs[30:], compress=True)
    return d


def test_parse_round_trip():
    recs = [
        ("https://a.example/x", "2024-01-01T00:00:00Z", b"<p>hello</p>"),
        ("https://b.example/y", "2024-01-02T00:00:00Z", "<p>caf\xe9</p>".encode()),
    ]
    import io, tempfile

    with tempfile.NamedTemporaryFile(suffix=".warc", delete=False) as f:
        path = f.name
    write_warc(path, recs)
    with open(path, "rb") as f:
        parsed = parse_warc(f.read())
    assert [(r["url"], r["html"]) for r in parsed] == [
        (u, h) for u, _t, h in recs
    ]


def test_non_html_records_skipped():
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.example/img\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 59\r\n\r\n"
        b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n\x89PNG fake bytes"
        b"\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://x.example/page\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 4\r\n\r\nGET "
        b"\r\n\r\n"
    )
    assert parse_warc(raw) == []
    assert parse_warc(gzip.compress(raw)) == []


def test_read_warc_both_compressions(spark, warc_dir):
    df = read_warc(spark, warc_dir)
    rows = df.collect()
    assert len(rows) == 60
    assert all(r["warc_ts"] is not None for r in rows)
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]


def test_warc_to_extraction_byte_identity(spark, warc_dir):
    """The full crawl-native path: WARC -> pages -> kernel. Output must
    equal the frozen oracle run on the same fixture pages."""
    pages = gen_pages(60, seed=77, pdf_frac=0.2)
    assert any(p.kind == "pdf" for p in pages)  # the PDF path is exercised
    want = {p.url: p.text for p in pages}
    got = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(read_warc(spark, warc_dir)).collect()
    }
    assert got == want


def test_malformed_http_block_is_skipped():
    """A response record whose body starts with HTTP/ but has no
    CRLFCRLF header terminator must be skipped, not emitted as an
    empty-html page."""
    from toyocr_spark.sources.warc import parse_warc

    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html"  # no terminator
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.example/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n" + body + b"\r\n\r\n"
    )
    good_body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>ok</p>"
    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://y.example/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(good_body)}\r\n".encode()
        + b"\r\n" + good_body + b"\r\n\r\n"
    )
    out = parse_warc(rec + good)
    assert [r["url"] for r in out] == ["https://y.example/"]
    assert out[0]["html"] == b"<p>ok</p>"


def test_wet_export_round_trip_byte_identity(spark, warc_dir, tmp_path):
    """The WET sink is the inverse of extraction at the byte level:
    export the extraction results as WET conversion segments, parse
    every segment back with the WARC parser, and every url's text
    bytes must equal the extraction output exactly. Re-running the
    export produces byte-identical files (gzip mtime=0)."""
    from toyocr_spark.sources.warc import write_wet

    result = extract_pages(read_warc(spark, warc_dir + "/*"))
    expected = {
        r["url"]: (r["extracted_text"] or "").encode("utf-8")
        for r in result.select("url", "extracted_text").collect()
    }

    # NOT inside warc_dir: later tests glob/list that session-scoped
    # directory as pure WARC input
    out1 = str(tmp_path / "wet1")
    out2 = str(tmp_path / "wet2")
    paths1 = write_wet(result, out1, segments=4)
    paths2 = write_wet(result, out2, segments=4)

    got: dict[str, bytes] = {}
    for p in paths1:
        with open(p, "rb") as f:
            for rec in parse_warc(f.read(), types=("conversion",)):
                got[rec["url"]] = rec["html"]
    assert got == expected
    assert len(paths1) == len(paths2)
    for p1, p2 in zip(paths1, paths2):
        with open(p1, "rb") as a, open(p2, "rb") as b:
            assert a.read() == b.read(), (p1, p2)


def test_wat_export_metadata_envelope(spark, warc_dir, tmp_path):
    """The WAT sink (Common Crawl's third sidecar): every url gets one
    WARC metadata record whose JSON envelope carries the title span,
    the sorted outlink edges, and the extraction counts — parseable
    back with the ordinary WARC parser, json.loads-clean, and
    byte-identical across re-runs."""
    import json

    from toyocr_spark.functions.linkmine import mine_outlinks
    from toyocr_spark.sources.warc import write_wat

    pages = read_warc(spark, warc_dir + "/*")
    result = extract_pages(pages)
    edges = mine_outlinks(pages)
    by_url = {}
    for r in edges.collect():
        by_url.setdefault(r["src_url"], []).append(r["target"])
    expected_meta = {
        r["url"]: (r["n_blocks"], r["n_kept"]) for r in result.collect()
    }

    out1 = str(tmp_path / "wat1")
    out2 = str(tmp_path / "wat2")
    paths1 = write_wat(result, out1, edges=edges, segments=4)
    paths2 = write_wat(result, out2, edges=edges, segments=4)

    seen = {}
    for p in paths1:
        with open(p, "rb") as f:
            for rec in parse_warc(f.read(), types=("metadata",)):
                seen[rec["url"]] = json.loads(bytes(rec["html"]).decode("utf-8"))
    assert set(seen) == set(expected_meta)
    for url, env in seen.items():
        pm = env["Envelope"]["Payload-Metadata"]
        assert pm["Extraction-Metadata"]["Blocks"] == expected_meta[url][0]
        assert pm["Extraction-Metadata"]["Kept-Blocks"] == expected_meta[url][1]
        links = [x["url"] for x in pm["HTML-Metadata"]["Links"]]
        assert links == sorted(by_url.get(url, []))
        title = pm["HTML-Metadata"]["Head"].get("Title")
        if title is not None:
            assert isinstance(title, str) and title
    for p1, p2 in zip(paths1, paths2):
        with open(p1, "rb") as a, open(p2, "rb") as b:
            assert a.read() == b.read(), (p1, p2)


def test_wat_title_is_the_first_title_span(spark, tmp_path):
    from toyocr_spark.pipeline import extract_pages as ep
    from toyocr_spark.sources.warc import wat_segments

    html = (
        "<html><body><h1>The Document Title</h1>"
        "<p>Body paragraph long enough to be kept by the scorer.</p>"
        "</body></html>"
    ).encode()
    pages = spark.createDataFrame(
        [("https://t.example/a", bytearray(html))], "url string, html binary"
    )
    import json

    seg = wat_segments(ep(pages), segments=1).collect()[0]
    body = bytes(seg["wat"]).split(b"\r\n\r\n")[1]
    env = json.loads(body.decode("utf-8"))
    assert (
        env["Envelope"]["Payload-Metadata"]["HTML-Metadata"]["Head"]["Title"]
        == "The Document Title"
    )


def test_wet_segments_deterministic_and_ordered(spark):
    """Segment routing is url-hash, in-segment order is by url: the
    same rows in any input order produce identical segment bytes."""
    from toyocr_spark.sources.warc import wet_segments

    rows = [(f"https://h{i % 3}.example/p/{i}", f"text {i} é") for i in range(40)]
    a = spark.createDataFrame(rows, "url string, extracted_text string")
    b = spark.createDataFrame(rows[::-1], "url string, extracted_text string")
    sa = {r["segment"]: bytes(r["wet"]) for r in wet_segments(a, 4).collect()}
    sb = {r["segment"]: bytes(r["wet"]) for r in wet_segments(b, 4).collect()}
    assert sa == sb
    assert sum(r["n_records"] for r in wet_segments(a, 4).collect()) == 40


def test_warc_provenance_and_point_fetch(spark, warc_dir, tmp_path):
    """The point-addressable-crawl loop: read WARC with capture
    provenance -> build the sorted CDX index carrying
    (warc_file, warc_offset, warc_length) -> look one host up through
    cluster.idx -> range-fetch exactly that record from the WARC ->
    the fetched bytes extract byte-identically to the full pipeline's
    output for the same url."""
    from toyocr_spark.extractor import extract
    from toyocr_spark.sources.cdx import cdx_lookup, write_cdx
    from toyocr_spark.sources.warc import fetch_warc_record, read_warc_members

    pages = read_warc_members(spark, os.path.join(warc_dir, "*.warc*"))
    rows = pages.collect()
    assert len(rows) > 0
    # provenance is parseable standalone: every record fetches back
    r0 = rows[0]
    rec = fetch_warc_record(r0["warc_file"], r0["warc_offset"], r0["warc_length"])
    assert rec is not None and rec["url"] == r0["url"]
    assert bytes(rec["html"]) == bytes(r0["html"])

    idx = str(tmp_path / "cdx_prov")
    write_cdx(
        pages, idx, shards=2,
        keep_cols=("warc_file", "warc_offset", "warc_length"),
    )
    # probe the first capture's host prefix
    from toyocr_spark.functions.urlfns import canonicalize_url, surt_key
    from pyspark.sql import functions as F

    some = (
        pages.select(surt_key(canonicalize_url(F.col("url"))).alias("k"))
        .limit(1).collect()[0]["k"]
    )
    prefix = some.split(")")[0] + ")"
    hits = cdx_lookup(spark, idx, prefix).collect()
    assert hits
    hit = hits[0]
    rec2 = fetch_warc_record(hit["warc_file"], hit["warc_offset"], hit["warc_length"])
    assert rec2 is not None
    # fetched bytes extract identically to the full-table path
    direct = extract(bytes(rec2["html"])).text
    full = {
        r["url"]: bytes(r["html"])
        for r in pages.filter(F.col("url") == rec2["url"]).collect()
    }
    assert direct == extract(full[rec2["url"]]).text


def test_extract_job_ingests_warc_directly(tmp_path, warc_dir):
    """extract_job --input-format warc: the production driver runs the
    full resume-safe pipeline straight off .warc/.warc.gz files."""
    import json
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=REPO)
    out_dir = str(tmp_path / "warc_extract")
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "extract_job.py"),
            "--input", os.path.join(warc_dir, "*.warc*"),
            "--input-format", "warc",
            "--output", out_dir, "--n-chunks", "2",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    from toyocr_spark.sources.warc import parse_warc

    n = 0
    for fn in os.listdir(warc_dir):
        if ".warc" not in fn:  # defensive: count only the WARC inputs
            continue
        with open(os.path.join(warc_dir, fn), "rb") as f:
            n += len(parse_warc(f.read()))
    assert summary["rows_extracted"] == n > 0


def test_http_meta_reader_profiles_every_response(spark, tmp_path):
    """parse_warc_http_meta sees what parse_warc filters out: redirects,
    404s, images — status + MIME + body length per response record,
    with conversion records and header-less bodies handled."""
    from toyocr_spark.sources.warc import parse_warc_http_meta, read_warc_http_meta

    def rec(url, wtype, body):
        hdr = (
            f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: {len(body)}\r\n"
        ).encode()
        return hdr + b"\r\n" + body + b"\r\n\r\n"

    raw = b"".join(
        [
            rec(
                "http://a.example/ok", "response",
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<html>x</html>",
            ),
            rec(
                "http://a.example/moved", "response",
                b"HTTP/1.1 301 Moved Permanently\r\nLocation: http://b/\r\nContent-Type: text/html\r\n\r\n",
            ),
            rec(
                "http://a.example/gone", "response",
                b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\nnope",
            ),
            rec(
                "http://a.example/logo", "response",
                b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n\x89PNGxxxx",
            ),
            rec("http://a.example/wet", "conversion", b"plain text body"),
            rec("http://a.example/rawbody", "response", b"no http envelope"),
        ]
    )
    metas = parse_warc_http_meta(raw)
    assert [(m["url"], m["http_status"], m["content_type"], m["content_length"]) for m in metas] == [
        ("http://a.example/ok", 200, "text/html", 14),
        ("http://a.example/moved", 301, "text/html", 0),
        ("http://a.example/gone", 404, "text/plain", 4),
        ("http://a.example/logo", 200, "image/png", 8),
        ("http://a.example/rawbody", 0, "", 16),
    ]
    # identical through gzip and through the Spark reader
    assert parse_warc_http_meta(gzip.compress(raw)) == metas
    p = str(tmp_path / "health.warc.gz")
    with open(p, "wb") as f:
        f.write(gzip.compress(raw))
    df = read_warc_http_meta(spark, p)
    rows = {r["url"]: (r["http_status"], r["content_type"]) for r in df.collect()}
    assert rows["http://a.example/moved"] == (301, "text/html")
    assert rows["http://a.example/logo"] == (200, "image/png")
    assert len(rows) == 5

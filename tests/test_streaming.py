"""Structured Streaming ingestion: byte-identity vs the batch path,
checkpoint-based no-replay on restart, and watermarked windowed aggs."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from toyocr_spark.fixtures.genpages import gen_pages
from toyocr_spark.pipeline import extract_pages
from toyocr_spark.sources.pages import PAGES_SCHEMA
from toyocr_spark.streaming import stream_extract, windowed_page_counts


@pytest.fixture(scope="module")
def stream_input(tmp_path_factory) -> str:
    """Pages corpus split into 3 files, as crawl segments land."""
    d = str(tmp_path_factory.mktemp("stream_in"))
    # pdf_frac: the %PDF- dispatch path must be byte-identical through
    # the streaming twin too, not just the batch pipeline
    pages = gen_pages(90, seed=99, pdf_frac=0.2)
    for i in range(3):
        chunk = pages[i * 30 : (i + 1) * 30]
        tbl = pa.table(
            {
                "url": pa.array([p.url for p in chunk], pa.string()),
                "warc_ts": pa.array(
                    [p.warc_ts for p in chunk], pa.timestamp("us", tz="UTC")
                ),
                "html": pa.array([p.html for p in chunk], pa.binary()),
                "text": pa.array([p.text for p in chunk], pa.string()),
                "lang": pa.array([p.lang for p in chunk], pa.string()),
            }
        )
        pq.write_table(tbl, os.path.join(d, f"segment-{i}.parquet"))
    return d


def _read_stream_result(spark, out_dir):
    paths = [
        os.path.join(out_dir, b)
        for b in sorted(os.listdir(out_dir))
        if b.startswith("batch=")
    ]
    return spark.read.parquet(*paths)


def test_stream_matches_batch_byte_identical(spark, stream_input, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_extract(spark, stream_input, out, ckpt, max_files_per_trigger=1)

    got = {
        r["url"]: r["extracted_text"]
        for r in _read_stream_result(spark, out).collect()
    }
    batch_pages = spark.read.schema(PAGES_SCHEMA).parquet(stream_input)
    want = {
        r["url"]: r["extracted_text"] for r in extract_pages(batch_pages).collect()
    }
    assert got == want  # streaming path is byte-identical to batch path

    # one lineage dir per micro-batch; with maxFilesPerTrigger=1 -> 3
    lineage_batches = sorted(os.listdir(os.path.join(out, "_lineage")))
    assert len(lineage_batches) == 3


def test_stream_outlinks_matches_batch_edge_set(spark, stream_input, tmp_path):
    """The crawler discovery loop: edges mined off the stream equal
    the batch mine_outlinks edge multiset exactly (mining is map-only,
    so the lift is identity by construction — this pins it)."""
    from toyocr_spark.functions.linkmine import mine_outlinks
    from toyocr_spark.streaming.ingest import stream_outlinks

    out = str(tmp_path / "edges_out")
    ckpt = str(tmp_path / "edges_ckpt")
    stream_outlinks(spark, stream_input, out, ckpt, max_files_per_trigger=1)

    got = sorted(
        (r["src_url"], r["target"])
        for r in _read_stream_result(spark, out).collect()
    )
    batch_pages = spark.read.schema(PAGES_SCHEMA).parquet(stream_input)
    want = sorted(
        (r["src_url"], r["target"])
        for r in mine_outlinks(batch_pages).collect()
    )
    assert got == want
    assert len(got) > 0  # the corpus really carries edges


def test_stream_blocklist_admission(spark, stream_input, tmp_path):
    """Streaming admission uses the SAME suffix + case-insensitive
    semantics as the batch drop_blocked_hosts stage: a blocklist entry
    for a PARENT domain (uppercased, to prove case folding) blocks
    every subdomain, and admitted pages are byte-identical to the
    batch path over the same admitted subset."""
    from toyocr_spark.functions.urlfns import drop_blocked_hosts
    from toyocr_spark.streaming.ingest import stream_blocklist_extract

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch_pages = spark.read.schema(PAGES_SCHEMA).parquet(stream_input)
    hosts = sorted(
        r["h"]
        for r in batch_pages.select(
            F.parse_url("url", F.lit("HOST")).alias("h")
        ).distinct().collect()
    )
    # UPPERCASE blocklist entries: hosts are case-insensitive, so the
    # spelling must not matter (the fixture corpus has a flat
    # host-N.example namespace, so the parent-suffix case lives in the
    # drop_blocked_hosts unit test; here we prove the streaming twin
    # delegates to that same operator)
    blocked = [hosts[0].upper(), hosts[1].upper()]
    bl = spark.createDataFrame([(h,) for h in blocked], "host string")
    stream_blocklist_extract(spark, stream_input, bl, out, ckpt)

    got = {
        r["url"]: r["extracted_text"]
        for r in _read_stream_result(spark, out).collect()
    }
    admitted = drop_blocked_hosts(
        batch_pages.withColumn("_host", F.parse_url("url", F.lit("HOST"))), "_host", bl
    ).drop("_host")
    want = {
        r["url"]: r["extracted_text"] for r in extract_pages(admitted).collect()
    }
    assert got == want
    assert 0 < len(got) < batch_pages.count()  # some blocked, some admitted
    # the UPPERCASE entries really blocked their lowercase hosts
    got_hosts = {u.split("/")[2] for u in got}
    assert hosts[0] not in got_hosts and hosts[1] not in got_hosts


def test_stream_restart_does_not_replay(spark, stream_input, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_extract(spark, stream_input, out, ckpt)
    batches_before = sorted(os.listdir(out))
    # restart with same checkpoint, no new files: nothing new committed
    stream_extract(spark, stream_input, out, ckpt)
    assert sorted(os.listdir(out)) == batches_before
    n = _read_stream_result(spark, out).count()
    assert n == 90  # no duplicates


def test_windowed_counts_with_watermark(spark, stream_input, tmp_path):
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_input)
    )
    agg = windowed_page_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["lang"]): r["n_pages"]
        for r in spark.sql("select * from win_counts").collect()
    }
    batch = (
        spark.read.schema(PAGES_SCHEMA)
        .parquet(stream_input)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("ws"), "lang", "n_pages")
    )
    want = {(r["ws"], r["lang"]): r["n_pages"] for r in batch.collect()}
    assert got == want


def test_stateful_host_progress(spark, stream_input, tmp_path):
    """applyInPandasWithState: running per-host totals accumulate
    ACROSS micro-batches (state survives), matching the batch-side
    ground truth at stream end."""
    from toyocr_spark.streaming import stateful_host_progress

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_input)
    )
    q = (
        stateful_host_progress(stream)
        .writeStream.format("memory")
        .queryName("host_prog")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from host_prog").collect()
    # last emission per host = max batches_seen
    last = {}
    for r in rows:
        if r["host"] not in last or r["batches_seen"] > last[r["host"]]["batches_seen"]:
            last[r["host"]] = r
    want = {
        r["host"]: (r["n"], r["b"])
        for r in spark.read.schema(PAGES_SCHEMA).parquet(stream_input)
        .groupBy(F.parse_url("url", F.lit("HOST")).alias("host"))
        .agg(F.count("*").alias("n"), F.sum(F.octet_length("html")).alias("b"))
        .collect()
    }
    got = {h: (r["pages_total"], r["bytes_total"]) for h, r in last.items()}
    assert got == want
    # state really crossed batches: some host appears in >1 micro-batch
    assert any(r["batches_seen"] > 1 for r in last.values())


def test_stream_dedup_matches_batch_survivor_set(spark, tmp_path):
    """Streaming exact dedup keeps exactly one page per html digest,
    the set of surviving digests equals the batch distinct set, and a
    duplicate planted in a LATER segment never displaces the first
    arrival (state persists across micro-batches)."""
    from toyocr_spark.streaming import stream_dedup

    d = str(tmp_path / "in")
    os.makedirs(d)
    pages = gen_pages(30, seed=123)
    # 3 segments; segment 2 re-ships the html of segment 0's first 5
    # pages under new urls (a byte-identical recrawl)
    segs = [pages[0:10], pages[10:20], pages[20:30]]
    dup_src = segs[0][:5]
    for i, chunk in enumerate(segs):
        rows = [(p.url, p.warc_ts, p.html, p.text, p.lang) for p in chunk]
        if i == 2:
            rows += [
                (p.url + "?mirror=1", p.warc_ts, p.html, p.text, p.lang)
                for p in dup_src
            ]
        tbl = pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
                "html": pa.array([r[2] for r in rows], pa.binary()),
                "text": pa.array([r[3] for r in rows], pa.string()),
                "lang": pa.array([r[4] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, os.path.join(d, f"segment-{i}.parquet"))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_dedup(spark, d, out, ckpt)
    got = _read_stream_result(spark, out)
    rows = got.select("url", "digest").collect()

    batch = spark.read.parquet(os.path.join(d, "*.parquet")).withColumn(
        "digest", F.md5(F.col("html"))
    )
    n_distinct = batch.select("digest").distinct().count()
    assert len(rows) == n_distinct  # exactly one survivor per digest
    assert {r["digest"] for r in rows} == {
        r["digest"] for r in batch.select("digest").distinct().collect()
    }
    # the mirrors arrived after their originals: none may survive
    assert not any(r["url"].endswith("?mirror=1") for r in rows)


def test_stream_cdx_segments_compact_to_batch_index(spark, stream_input, tmp_path):
    """Streamed per-micro-batch CDX segments, once compacted, equal the
    batch-built index over the same pages (same capture set), and the
    compacted index remains sorted + cluster.idx-pruned."""
    import json

    from toyocr_spark.sources.cdx import (
        CLUSTER_IDX, INDEX_DIR, cdx_lookup, write_cdx,
    )
    from toyocr_spark.streaming.ingest import compact_cdx, stream_cdx

    idx_stream = str(tmp_path / "cdx_stream")
    ckpt = str(tmp_path / "ckpt_cdx")
    stream_cdx(spark, stream_input, idx_stream, ckpt, max_files_per_trigger=1)
    segs = os.listdir(os.path.join(idx_stream, "segments"))
    assert len(segs) >= 2  # genuinely incremental

    out = str(tmp_path / "cdx_compact")
    summary = compact_cdx(spark, idx_stream, out, shards=3)

    batch_idx = str(tmp_path / "cdx_batch")
    pages = spark.read.schema(PAGES_SCHEMA).parquet(stream_input)
    write_cdx(pages, batch_idx, shards=3)

    a = spark.read.parquet(os.path.join(out, INDEX_DIR)).select(
        "surt_key", "ts14", "url", "digest", "n_bytes"
    )
    b = spark.read.parquet(os.path.join(batch_idx, INDEX_DIR)).select(
        "surt_key", "ts14", "url", "digest", "n_bytes"
    )
    assert a.count() == summary["rows"] == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    with open(os.path.join(out, CLUSTER_IDX)) as f:
        entries = [json.loads(ln) for ln in f if ln.strip()]
    for x, y in zip(entries, entries[1:]):
        assert x["last_key"] <= y["first_key"]
    some = a.limit(1).collect()[0]["surt_key"]
    prefix = some.split(")")[0] + ")"
    want = a.filter(F.col("surt_key").startswith(prefix)).count()
    assert cdx_lookup(spark, out, prefix).count() == want > 0


def test_stream_neardup_matches_batch_admission(spark, tmp_path):
    """Streaming near-dup admission == batch neardup_survivors when
    arrival order matches id order: exact text mirrors in LATER
    segments are rejected, the first arrival of each near-dup family
    survives, and hash-less (empty-text) pages pass through."""
    import datetime as dt

    from toyocr_spark.operators.dedup import neardup_survivors, simhash64
    from toyocr_spark.streaming import stream_neardup

    d = str(tmp_path / "in")
    os.makedirs(d)
    ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    base_text = lambda s: " ".join(words[(s * 3 + j) % 10] for j in range(30))  # noqa: E731

    rows_by_seg: list[list[tuple]] = [[], [], []]
    for seg in range(3):
        for i in range(6):
            url = f"{seg:02d}-{i:02d}.example.com/x"
            text = base_text(seg * 6 + i)
            rows_by_seg[seg].append((url, ts, b"<html>x</html>", text, "en"))
    # same-segment exact dup: later url must lose
    rows_by_seg[0].append(("00-90.example.com/dup", ts, b"<html>x</html>", base_text(0), "en"))
    # cross-segment mirrors of segment-0 texts: must lose
    rows_by_seg[2].append(("02-90.example.com/mirror", ts, b"<html>x</html>", base_text(1), "en"))
    rows_by_seg[2].append(("02-91.example.com/mirror", ts, b"<html>x</html>", base_text(2), "en"))
    # hash-less page (empty text): must be admitted
    rows_by_seg[1].append(("01-90.example.com/empty", ts, b"<html>x</html>", "", "en"))

    for seg, rows in enumerate(rows_by_seg):
        tbl = pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
                "html": pa.array([r[2] for r in rows], pa.binary()),
                "text": pa.array([r[3] for r in rows], pa.string()),
                "lang": pa.array([r[4] for r in rows], pa.string()),
            }
        )
        path = os.path.join(d, f"segment-{seg}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000 + seg * 60, 1_700_000_000 + seg * 60))

    out, ckpt, state = (str(tmp_path / n) for n in ("out", "ckpt", "state"))
    stream_neardup(spark, d, out, ckpt, state)
    got = {r["url"] for r in _read_stream_result(spark, out).select("url").collect()}

    batch = spark.read.parquet(os.path.join(d, "*.parquet"))
    sim = simhash64(batch.select("url", "text"), "url", "text", 8)
    dropped = {
        r["id"]
        for r in sim.exceptAll(neardup_survivors(sim)).select("id").collect()
    }
    expected = {r["url"] for r in batch.select("url").collect()} - dropped

    assert got == expected
    assert "00-90.example.com/dup" not in got
    assert "02-90.example.com/mirror" not in got
    assert "02-91.example.com/mirror" not in got
    assert "01-90.example.com/empty" in got


def test_stream_neardup_state_compaction_preserves_admission(spark, tmp_path):
    """Compacting the hash log into one segment changes file count
    only: a new micro-batch run over compacted state admits exactly
    what it would have over the raw per-batch segments."""
    import datetime as dt
    import glob

    from toyocr_spark.streaming import compact_neardup_state, stream_neardup

    d = str(tmp_path / "in")
    os.makedirs(d)
    ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    # per-doc vocabularies: docs are genuinely distinct, mirrors exact
    text = lambda s: " ".join(f"w{s}x{j}" for j in range(30))  # noqa: E731
    for seg in range(2):
        rows = [
            (f"{seg:02d}-{i:02d}.example.com/x", ts, b"<x>", text(seg * 6 + i), "en")
            for i in range(6)
        ]
        tbl = pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
                "html": pa.array([r[2] for r in rows], pa.binary()),
                "text": pa.array([r[3] for r in rows], pa.string()),
                "lang": pa.array([r[4] for r in rows], pa.string()),
            }
        )
        path = os.path.join(d, f"segment-{seg}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000 + seg * 60,) * 2)

    out, ckpt, state = (str(tmp_path / n) for n in ("out", "ckpt", "state"))
    stream_neardup(spark, d, out, ckpt, state)
    segs_before = glob.glob(os.path.join(state, "batch=*"))
    n = compact_neardup_state(spark, state)
    assert n == 12
    segs_after = glob.glob(os.path.join(state, "batch=*"))
    assert [os.path.basename(p) for p in segs_after] == ["batch=-1"]
    assert len(segs_before) > 1

    # a third segment mirroring segment-0 texts: all rejected, same as
    # it would be against the raw log
    rows = [
        (f"02-{i:02d}.example.com/mirror", ts, b"<x>", text(i), "en")
        for i in range(6)
    ]
    tbl = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "lang": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    path = os.path.join(d, "segment-2.parquet")
    pq.write_table(tbl, path)
    os.utime(path, (1_700_000_200,) * 2)
    stream_neardup(spark, d, out, ckpt, state)
    urls = {r["url"] for r in _read_stream_result(spark, out).select("url").collect()}
    assert not any(u.endswith("/mirror") for u in urls)
    assert len(urls) == 12


def test_stream_recrawl_matches_batch_schedule(spark, tmp_path):
    """Streaming change-rate tracking == the q169 batch operator when
    snapshots arrive time-ordered: the per-batch monoid summaries
    (within-counts + boundary transitions) fold to exactly the batch
    window pass, including urls whose change lands ON a micro-batch
    boundary and urls entirely inside one batch."""
    from toyocr_spark.operators.recrawl import change_counts, schedule_buckets
    from toyocr_spark.streaming import recrawl_schedule_from_state, stream_recrawl

    d = str(tmp_path / "obs")
    os.makedirs(d)
    # 60 urls, change period p = 1 + i%6, six snapshots each — the
    # q169 plant; digest = hash of (i, floor(t/p))
    n = 60

    def digest(i: int, t: int) -> int:
        p = 1 + i % 6
        return hash((i, t // p)) & 0x7FFFFFFFFFFFFFFF

    # micro-batches split by TIME (t 0-1 | 2-3 | 4-5), so batch
    # boundaries fall mid-history for every url
    for seg, ts in enumerate(((0, 1), (2, 3), (4, 5))):
        rows = [
            (f"https://site-{i}.example/page", t, digest(i, t))
            for i in range(n)
            for t in ts
        ]
        tbl = pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "snap_t": pa.array([r[1] for r in rows], pa.int64()),
                "digest": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        path = os.path.join(d, f"segment-{seg}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000 + seg * 60, 1_700_000_000 + seg * 60))

    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    stream_recrawl(spark, d, state, ckpt)

    got = {
        r["url"]: (r["n_changes"], r["bucket"])
        for r in recrawl_schedule_from_state(spark, state).collect()
    }
    batch_obs = spark.read.parquet(d)
    want = {
        r["url"]: (r["n_changes"], r["bucket"])
        for r in schedule_buckets(change_counts(batch_obs)).collect()
    }
    assert got == want and len(got) == n
    # the closed form: n_changes = floor(5 / p)
    for i in range(n):
        assert got[f"https://site-{i}.example/page"][0] == 5 // (1 + i % 6)

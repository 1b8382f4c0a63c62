"""Pipeline-level byte-identity + lineage + resume tests — the
north_rule gate (BASELINE.md): the distributed pipeline must reproduce
the frozen oracle's text for every url, survive restarts, and leave
exactly one lineage row per (chunk, partition)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from toyocr_spark.pipeline import (
    identity_report,
    read_lineage,
    read_result,
    resumable_run,
    run_extraction,
)
from toyocr_spark.sources import read_pages


def test_byte_identity_full_sweep(spark, pages_dir):
    pages = read_pages(spark, pages_dir)
    result = run_extraction(pages, num_partitions=8)
    row = identity_report(result, pages).collect()[0]
    assert row["n_urls"] == pages.count()
    assert row["n_identical"] == row["n_urls"], "byte-identity must hold for every url"
    assert row["pass_rate"] == 1.0


def test_result_schema_stable(spark, pages_dir):
    result = run_extraction(read_pages(spark, pages_dir), num_partitions=4)
    assert [f.name for f in result.schema.fields] == [
        "url", "extracted_text", "spans", "n_blocks", "n_kept", "html_len",
        "truncated", "html_digest",
    ]
    one = result.filter(F.col("n_kept") > 0).limit(1).collect()[0]
    sp = one["spans"][0]
    assert set(sp.asDict()) == {"start", "end", "kind"}


def test_spans_match_expected_sidecar(spark, pages_dir):
    """Engine spans == golden expected_spans (the GT-zip protocol graft):
    exact equality on (url, block_id, start, end, kind)."""
    result = run_extraction(read_pages(spark, pages_dir), num_partitions=4)
    ours = result.select(
        "url", F.posexplode_outer("spans").alias("block_id", "s")
    ).select("url", "block_id", "s.start", "s.end", "s.kind").filter(F.col("s").isNotNull())
    golden = spark.read.parquet(f"{pages_dir}/expected_spans.parquet").select(
        "url", F.col("block_id").cast("int").alias("block_id"), "start", "end", "kind"
    )
    ours_c, golden_c = ours.count(), golden.count()
    assert ours_c == golden_c
    assert ours.exceptAll(golden.select(ours.columns)).count() == 0


def test_resumable_run_and_restart(spark, pages_dir, tmp_path):
    pages = read_pages(spark, pages_dir)
    out_a = str(tmp_path / "out_clean")
    clean = resumable_run(spark, pages, out_a, run_id="clean", n_chunks=4, num_partitions=4)
    assert clean["executed"] == [0, 1, 2, 3]

    # crashed run: fails after 2 chunks, restart completes the rest
    out_b = str(tmp_path / "out_crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        resumable_run(spark, pages, out_b, run_id="crash1", n_chunks=4,
                      num_partitions=4, fail_after_chunk=1)
    resumed = resumable_run(spark, pages, out_b, run_id="crash2", n_chunks=4, num_partitions=4)
    assert len(resumed["skipped"]) == 2 and len(resumed["executed"]) == 2

    a = read_result(spark, out_a)
    b = read_result(spark, out_b)
    assert a.count() == pages.count() == b.count()
    # identical final tables regardless of the crash (S12 semantics)
    key = ["url", "extracted_text"]
    assert a.select(key).exceptAll(b.select(key)).count() == 0
    assert b.select(key).exceptAll(a.select(key)).count() == 0

    # lineage: exactly one row per (chunk, partition); chunk digests are
    # order-insensitive so both runs agree per chunk
    lin_a = read_lineage(spark, out_a)
    lin_b = read_lineage(spark, out_b)
    dup = lin_b.groupBy("chunk_id", "partition_id").count().filter(F.col("count") > 1)
    assert dup.count() == 0
    def dig(df):
        return {
            r["chunk_id"]: sorted(r["ds"])
            for r in df.groupBy("chunk_id").agg(F.collect_list("digest").alias("ds")).collect()
        }

    assert dig(lin_a) == dig(lin_b)

    # byte identity also holds on the resumed output
    row = identity_report(b, pages).collect()[0]
    assert row["pass_rate"] == 1.0


def test_commit_markers_atomic(spark, pages_dir, tmp_path):
    out = str(tmp_path / "out_commits")
    resumable_run(spark, read_pages(spark, pages_dir), out, n_chunks=2, num_partitions=2)
    commits = sorted(os.listdir(os.path.join(out, "_commits")))
    assert commits == ["chunk-0.json", "chunk-1.json"]


def test_snapshot_read_hides_uncommitted_chunks(spark, pages_dir, tmp_path):
    """A crash between parquet write and commit marker must leave the
    partial chunk INVISIBLE to readers (snapshot isolation of the
    commit log). Simulated by deleting a marker after a full run —
    equivalent on-disk state to the crash window."""
    import os

    from toyocr_spark.pipeline import read_lineage, read_result, resumable_run
    from toyocr_spark.sources.pages import read_pages

    out = str(tmp_path / "snap")
    pages = read_pages(spark, pages_dir)
    resumable_run(spark, pages, out, n_chunks=4)
    total = read_result(spark, out).count()

    os.remove(os.path.join(out, "_commits", "chunk-2.json"))
    visible = read_result(spark, out)
    assert visible.count() < total
    assert read_result(spark, out, committed_only=False).count() == total
    assert read_lineage(spark, out).select("chunk_id").distinct().count() == 3

    # resume re-executes exactly the uncommitted chunk; totals restore
    r = resumable_run(spark, pages, out, n_chunks=4)
    assert r["executed"] == [2]
    assert read_result(spark, out).count() == total


def test_sub_batch_slicing_is_invisible(monkeypatch):
    """_extract_batches slices oversized Arrow batches on a byte budget
    (int32-offset guard). Driven directly in-process (executor workers
    re-import the module, so a Spark-side monkeypatch would be
    vacuous): a tiny budget must yield MORE batches but byte-identical
    concatenated output."""
    import pyarrow as pa

    from toyocr_spark import pipeline

    htmls = [f"<p>doc {i} body text</p>".encode() * 20 for i in range(64)]
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([f"u{i}" for i in range(64)], pa.string()),
            pa.array(htmls, pa.binary()),
            pa.array(list(range(64)), pa.int64()),
        ],
        names=["url", "html", "html_digest"],
    )
    one = list(pipeline._extract_batches(iter([batch])))
    monkeypatch.setattr(pipeline, "_OUT_BATCH_BYTES", 1024)
    many = list(pipeline._extract_batches(iter([batch])))
    assert len(one) == 1 and len(many) > 4
    t_one = pa.Table.from_batches(one)
    t_many = pa.Table.from_batches(many)
    assert t_one.equals(t_many.combine_chunks())
    assert t_one.num_rows == 64

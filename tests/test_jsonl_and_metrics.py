"""JSONL pages source round-trip and Observation-based chunk metrics."""

from __future__ import annotations

import base64
import json
import os

from toyocr_spark.fixtures.genpages import gen_pages
from toyocr_spark.pipeline import identity_report, read_lineage, resumable_run, run_extraction
from toyocr_spark.sources.pages import read_pages, read_pages_jsonl


def test_jsonl_source_round_trip(spark, tmp_path):
    pages = gen_pages(50, seed=123)
    path = str(tmp_path / "pages.jsonl")
    with open(path, "w") as f:
        for p in pages:
            f.write(json.dumps({
                "url": p.url,
                "warc_ts": p.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                "html_b64": base64.b64encode(p.html).decode(),
                "text": p.text,
                "lang": p.lang,
            }) + "\n")
    df = read_pages_jsonl(spark, path)
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert df.count() == 50
    # the jsonl path feeds extraction byte-identically
    rep = identity_report(run_extraction(df, num_partitions=4), df).collect()[0]
    assert rep["pass_rate"] == 1.0


def test_chunk_commit_metrics_match_lineage(spark, pages_dir, tmp_path):
    out = str(tmp_path / "obs")
    pages = read_pages(spark, pages_dir)
    resumable_run(spark, pages, out, n_chunks=3)
    metas = []
    for f in sorted(os.listdir(os.path.join(out, "_commits"))):
        with open(os.path.join(out, "_commits", f)) as fh:
            metas.append(json.load(fh))
    assert all({"rows", "bytes_in", "chars_out", "truncated_rows"} <= set(m) for m in metas)
    total_rows = sum(m["rows"] for m in metas)
    lineage_rows = read_lineage(spark, out).groupBy().sum("row_count").collect()[0][0]
    assert total_rows == lineage_rows == pages.count()
    assert sum(m["chars_out"] for m in metas) > 0

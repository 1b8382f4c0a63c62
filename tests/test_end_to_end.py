"""The full user journey through the real CLIs: a crawl lands as WARC
files; extract_job runs the resume-safe pipeline straight off them and
exports WET + CDX sidecars; prep_job curates the extracted text and
trains a tokenizer on the survivors; index_job builds the provenance
index that makes every capture range-addressable; fetch_warc_record
closes the loop back to the original bytes."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _job(name: str, *args: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", name), *args],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, f"{name} failed:\n{out.stderr[-3000:]}"
    return json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )


@pytest.mark.slow
def test_full_crawl_to_corpus_journey(tmp_path, spark):
    from toyocr_spark.fixtures.genpages import gen_pages
    from toyocr_spark.sources.warc import parse_warc, write_warc

    # 1. a crawl lands: two WARC segments, one gzipped, PDFs mixed in
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    pages = gen_pages(80, seed=4242, pdf_frac=0.25)
    recs = [(p.url, "2026-03-01T00:00:00Z", p.html) for p in pages]
    write_warc(str(warc_dir / "seg-0.warc"), recs[:40])
    write_warc(str(warc_dir / "seg-1.warc.gz"), recs[40:], compress=True)
    glob = str(warc_dir / "*.warc*")

    # 2. extraction straight off the WARC, with WET + CDX sidecars
    out_dir = str(tmp_path / "extracted")
    summary = _job(
        "extract_job.py",
        "--input", glob, "--input-format", "warc",
        "--output", out_dir, "--n-chunks", "2",
        "--wet-output", str(tmp_path / "wet"), "--wet-segments", "2",
        "--wat-output", str(tmp_path / "wat"),
        "--cdx-output", str(tmp_path / "cdx"), "--cdx-shards", "2",
    )
    assert summary["rows_extracted"] == 80
    assert summary["cdx_rows"] == 80
    assert summary["wet_files"] >= 1
    assert summary["wat_files"] >= 1

    # 3. WET + WAT sidecars round-trip through the WARC parser
    wet_texts = []
    for fn in sorted(os.listdir(tmp_path / "wet")):
        with open(tmp_path / "wet" / fn, "rb") as f:
            wet_texts += parse_warc(f.read(), types=("conversion",))
    assert len(wet_texts) == 80
    import json as _json

    wat_recs = []
    for fn in sorted(os.listdir(tmp_path / "wat")):
        with open(tmp_path / "wat" / fn, "rb") as f:
            wat_recs += parse_warc(f.read(), types=("metadata",))
    assert len(wat_recs) == 80
    assert all(
        "Payload-Metadata"
        in _json.loads(bytes(r["html"]).decode("utf-8"))["Envelope"]
        for r in wat_recs
    )

    # 4. curation + tokenizer training on the extracted corpus
    from pyspark.sql import functions as F

    from toyocr_spark.pipeline import read_result

    docs = read_result(spark, out_dir).select(
        F.xxhash64("url").alias("doc_id"), F.col("extracted_text").alias("text")
    )
    docs_path = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(docs_path)
    bl = tmp_path / "phrases.txt"
    bl.write_text("nonexistent phrase sequence\n")
    funnel = _job(
        "prep_job.py",
        "--documents", docs_path, "--output", str(tmp_path / "curated"),
        "--min-punct", "0", "--min-chars", "40", "--min-tokens", "8",
        "--phrase-blocklist", str(bl),
        "--bpe-merges", "4", "--bpe-artifact", str(tmp_path / "merges.txt"),
    )
    assert funnel["input"] == 80
    assert funnel["after_quality"] > 0
    assert funnel["bpe_merges"] == 4 and funnel["bpe_tokens_total"] > 0
    assert (tmp_path / "merges.txt").read_text().startswith("#version: 0.2")

    # 5. provenance index over the raw crawl + point fetch back to bytes
    idx = str(tmp_path / "cdx_prov")
    built = _job("index_job.py", "build", "--warc", glob, "--output", idx,
                 "--shards", "2")
    assert built["rows"] == 80
    from toyocr_spark.extractor import extract
    from toyocr_spark.sources.cdx import cdx_lookup
    from toyocr_spark.sources.warc import fetch_warc_record

    probe = _job("index_job.py", "lookup", "--index", idx,
                 "--prefix", "example,")
    assert probe["n_hits"] == 80

    hit = cdx_lookup(spark, idx, "example,").limit(1).collect()[0]
    rec = fetch_warc_record(hit["warc_file"], hit["warc_offset"], hit["warc_length"])
    # fixture urls are already canonical, so index url == record url
    assert rec is not None and rec["url"] == hit["url"]
    by_url = {p.url: p for p in pages}
    src = by_url[rec["url"]]
    assert bytes(rec["html"]) == src.html
    # the fetched bytes extract exactly like the pipeline did
    want = {
        r["url"]: r["extracted_text"]
        for r in read_result(spark, out_dir).filter(
            F.col("url") == rec["url"]
        ).collect()
    }
    assert extract(bytes(rec["html"])).text == want[rec["url"]]

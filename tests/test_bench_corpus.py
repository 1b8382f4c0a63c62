"""The office bench corpus: every page must be a real container the
kernel dispatches, with the intended body extracted and the planted
chrome structurally excluded — the same contract the HTML/PDF bench
corpora get implicitly from the identity gauntlets."""

from __future__ import annotations

import pyspark.sql.functions as F

from toyocr_spark.bench_corpus import synth_office_pages
from toyocr_spark.pipeline import run_extraction


def test_office_bench_corpus_extracts_all_thirtynine_formats(spark, sf_dir):
    pages = synth_office_pages(spark, sf_dir, replicas=2).cache()
    try:
        res = run_extraction(pages, num_partitions=4).cache()
        per_fmt = {
            r["fmt"]: r
            for r in res.groupBy(
                F.regexp_extract("url", r"example/(\w+)/", 1).alias("fmt")
            )
            .agg(
                F.count("*").alias("docs"),
                F.min(F.length("extracted_text")).alias("min_chars"),
                F.sum(
                    F.when(F.col("extracted_text").contains("chrome"), 1).otherwise(0)
                ).alias("chrome_leaks"),
                F.sum(
                    F.when(
                        F.col("extracted_text").contains("Synthesized bench document"),
                        1,
                    ).otherwise(0)
                ).alias("with_title"),
            )
            .collect()
        }
        assert set(per_fmt) == {
            "docx", "xlsx", "pptx", "epub", "rtf", "doc", "xls", "ppt",
            "mht", "odt", "ods", "odp", "md", "tar", "csv", "tex",
            "ipynb", "sub", "wiki", "eml", "mbox", "ics", "zip", "ps",
            "fb2", "mobi", "jsonl", "rst", "man", "adoc", "org", "texi",
            "db", "mdoc", "gmi", "po", "ttml", "bib", "ms",
        }
        n_docs = pages.count()
        assert res.count() == n_docs
        assert sum(r["docs"] for r in per_fmt.values()) == n_docs
        for fmt, r in per_fmt.items():
            assert r["min_chars"] > 0, fmt  # no undecodable/empty docs
            assert r["chrome_leaks"] == 0, fmt  # header/footer/notes/nav excluded
            assert r["with_title"] == r["docs"], fmt  # heading block survives
    finally:
        pages.unpersist()

#!/usr/bin/env python3
"""Evaluation driver — the ``--eval-only`` mirror (SURVEY.md §3.3).

Scores an extraction result (or runs extraction inline) against the
reference columns of a pages fixture:

  * byte-identity pass rate: extracted_text == text per url (J5, the
    strictest word-spotting form);
  * span-level detection quality: engine spans vs the
    ``expected_spans.parquet`` sidecar, greedy 1:1 IoU matching at 0.5
    (J3), don't-care suppression of ignored ground truth (J4), per-url
    then global precision/recall/hmean (A4) — the ICDAR protocol shape
    (/root/reference/evaluation/scripts.py:246-335) as DataFrame ops.

Usage:
    spark-submit --py-files dist/toyocr_spark.zip jobs/eval_job.py \\
        --pages <fixture dir> [--results <extract_job output dir>]

Prints one JSON line with both metric families.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="toyocr_spark eval job")
    ap.add_argument("--pages", required=True, help="pages fixture dir (pages.parquet + expected_spans.parquet)")
    ap.add_argument("--results", default=None, help="extract_job output dir; omit to extract inline")
    ap.add_argument("--iou", type=float, default=0.5)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from toyocr_spark.evaluation import evaluate_extraction
    from toyocr_spark.pipeline import extract_pages, read_result
    from toyocr_spark.sources.pages import read_pages

    spark = SparkSession.builder.appName("toyocr-eval").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    pages = read_pages(spark, args.pages)
    result = (
        read_result(spark, args.results) if args.results else extract_pages(pages)
    )
    spans_path = os.path.join(args.pages, "expected_spans.parquet")
    expected = spark.read.parquet(spans_path) if os.path.exists(spans_path) else None
    report = evaluate_extraction(result, pages, expected, iou_threshold=args.iou)

    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

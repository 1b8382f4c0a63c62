#!/usr/bin/env python3
"""The production extraction driver — the spark-submit entry point.

Cluster deploy (north_rule contract):

    python tools/make_pyfiles.py                       # -> dist/toyocr_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/toyocr_spark.zip \\
        jobs/extract_job.py \\
        --input  <pages parquet/Iceberg path> \\
        --output <result dir> \\
        --n-chunks 256 --salt-threshold 0.01

Local smoke:

    spark-submit --master 'local[8]' --py-files dist/toyocr_spark.zip \\
        jobs/extract_job.py --input /tmp/pages --output /tmp/out --n-chunks 4

The job is restart-safe: rerunning with the same --output resumes from
the commit log, skipping finished chunks (pipeline.resumable_run). Hot
hosts above --salt-threshold of all rows are detected by a pre-agg and
salted across reducers.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="toyocr_spark extraction job")
    ap.add_argument("--input", required=True, help="pages table path (url, warc_ts, html, text, lang) or WARC glob with --input-format warc")
    ap.add_argument(
        "--input-format", choices=("pages", "warc"), default="pages",
        help="'warc' ingests .warc/.warc.gz files directly (responses "
        "become the html column; PDFs flow through magic dispatch)",
    )
    ap.add_argument("--output", required=True, help="result directory (resume-safe)")
    ap.add_argument("--n-chunks", type=int, default=64, help="commit-log granularity")
    ap.add_argument("--num-partitions", type=int, default=None, help="shuffle width per chunk (default 2x parallelism)")
    ap.add_argument("--salt-threshold", type=float, default=0.01, help="host frequency above which urls are salted; <=0 disables the pre-agg")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--strategy", default="density", help="registered extractor strategy (extractor/registry.py)")
    ap.add_argument("--delta-from", default=None, help="previous run's output dir: re-extract only pages whose (url, html bytes) changed")
    ap.add_argument(
        "--delta-bloom-bits", type=int, default=None,
        help="bloom pre-filter size in bits for --delta-from (size ~10 bits "
        "per previously-seen page for ~1%% FP): bloom misses skip the exact "
        "anti-join entirely; results are identical either way",
    )
    ap.add_argument(
        "--wet-output", default=None,
        help="also export the extracted text as WET conversion segments "
        "(Common Crawl's sidecar format) under this directory",
    )
    ap.add_argument(
        "--wet-segments", type=int, default=16,
        help="WET segment count (pick ~ corpus_bytes / 1 GB at scale)",
    )
    ap.add_argument(
        "--wat-output", default=None,
        help="also export per-url metadata (title span, outlink edges, "
        "extraction counts) as WAT metadata segments — Common Crawl's "
        "third sidecar next to WET and CDX — under this directory",
    )
    ap.add_argument(
        "--cdx-output", default=None,
        help="also build the sorted SURT-keyed CDX capture index over "
        "the input pages under this directory (index shards + "
        "cluster.idx block boundaries)",
    )
    ap.add_argument(
        "--cdx-shards", type=int, default=8,
        help="CDX shard count (pick ~ index_rows / 10M at scale)",
    )
    args = ap.parse_args(argv)

    # imports deferred: under spark-submit --py-files the zip only joins
    # sys.path once the SparkContext bootstraps the driver env
    from pyspark.sql import SparkSession

    from toyocr_spark.plans.partitioning import hot_hosts
    from toyocr_spark.pipeline import delta_pages, read_lineage, read_result, resumable_run
    from toyocr_spark.sources.pages import read_pages

    spark = SparkSession.builder.appName("toyocr-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.input_format == "warc":
        from toyocr_spark.sources.warc import read_warc

        pages = read_warc(spark, args.input)
    else:
        pages = read_pages(spark, args.input)
    if args.delta_from:
        pages = delta_pages(
            pages, read_result(spark, args.delta_from), bloom_m_bits=args.delta_bloom_bits
        )
    hot = (
        hot_hosts(pages, threshold_fraction=args.salt_threshold)
        if args.salt_threshold > 0
        else []
    )
    summary = resumable_run(
        spark,
        pages,
        args.output,
        run_id=args.run_id,
        n_chunks=args.n_chunks,
        num_partitions=args.num_partitions,
        hot=hot,
        strategy=args.strategy,
    )
    if args.wet_output:
        from toyocr_spark.sources.warc import write_wet

        summary["wet_files"] = len(
            write_wet(
                read_result(spark, args.output),
                args.wet_output,
                segments=args.wet_segments,
            )
        )
    if args.wat_output:
        from toyocr_spark.functions.linkmine import mine_outlinks
        from toyocr_spark.sources.warc import write_wat

        summary["wat_files"] = len(
            write_wat(
                read_result(spark, args.output),
                args.wat_output,
                edges=mine_outlinks(pages),
                segments=args.wet_segments,
            )
        )
    if args.cdx_output:
        from toyocr_spark.sources.cdx import write_cdx

        cdx = write_cdx(pages, args.cdx_output, shards=args.cdx_shards)
        summary["cdx_shards"] = cdx["shards"]
        summary["cdx_rows"] = cdx["rows"]
    lineage = read_lineage(spark, args.output)
    summary["hot_hosts"] = hot
    summary["lineage_rows"] = lineage.count()
    summary["rows_extracted"] = int(
        lineage.groupBy().sum("row_count").collect()[0][0] or 0
    )
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

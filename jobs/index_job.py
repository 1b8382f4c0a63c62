#!/usr/bin/env python3
"""CDX index driver — build, merge, and probe the sorted capture
index as a spark-submit job.

Build from a pages table (parquet) or directly from WARC or ARC
files (both archive paths carry (file, offset, length) capture
provenance under the same column names, so every index row is
range-addressable back into its archive and mixed ARC+WARC crawls
share one index schema):

    spark-submit --py-files dist/toyocr_spark.zip jobs/index_job.py \\
        build --pages /data/pages --output /data/cdx --shards 64
    spark-submit ... jobs/index_job.py \\
        build --warc '/data/crawl/*.warc.gz' --output /data/cdx

Merge per-snapshot indexes (one range Exchange over index rows, page
bytes untouched):

    spark-submit ... jobs/index_job.py \\
        merge --inputs /data/cdx-2026-07,/data/cdx-2026-08 \\
        --output /data/cdx-merged

Probe a SURT prefix (host or registrable domain) through cluster.idx
block pruning:

    spark-submit ... jobs/index_job.py \\
        lookup --index /data/cdx --prefix 'example,host-3)'
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="toyocr_spark CDX index job")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build a sorted index from captures")
    src = b.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="pages table path (url, warc_ts, html)")
    src.add_argument("--warc", help="WARC glob; rows carry (file, offset, length) provenance")
    src.add_argument("--arc", help="ARC glob (pre-WARC crawls); same provenance columns")
    b.add_argument("--output", required=True)
    b.add_argument("--shards", type=int, default=8)

    m = sub.add_parser("merge", help="merge per-snapshot indexes")
    m.add_argument("--inputs", required=True, help="comma-separated index dirs")
    m.add_argument("--output", required=True)
    m.add_argument("--shards", type=int, default=8)

    lk = sub.add_parser("lookup", help="probe a SURT prefix")
    lk.add_argument("--index", required=True)
    lk.add_argument("--prefix", required=True)
    lk.add_argument("--limit", type=int, default=20)

    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from toyocr_spark.sources.cdx import cdx_lookup, merge_cdx, write_cdx

    spark = SparkSession.builder.appName("toyocr-index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "build":
        if args.warc:
            from toyocr_spark.sources.warc import read_warc_members

            pages = read_warc_members(spark, args.warc)
            keep = ("warc_file", "warc_offset", "warc_length")
        elif args.arc:
            from toyocr_spark.sources.arc import read_arc_members

            pages = read_arc_members(spark, args.arc)
            keep = ("warc_file", "warc_offset", "warc_length")
        else:
            from toyocr_spark.sources.pages import read_pages

            pages = read_pages(spark, args.pages)
            keep = ()
        summary = write_cdx(pages, args.output, shards=args.shards, keep_cols=keep)
    elif args.cmd == "merge":
        summary = merge_cdx(
            spark,
            [p.strip() for p in args.inputs.split(",") if p.strip()],
            args.output,
            shards=args.shards,
        )
    else:
        hits = cdx_lookup(spark, args.index, args.prefix)
        rows = hits.limit(args.limit).collect()
        summary = {
            "prefix": args.prefix,
            "n_hits": hits.count(),
            "sample": [
                {k: r[k] for k in ("surt_key", "ts14", "url")} for r in rows[:5]
            ],
        }

    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

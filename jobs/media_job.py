#!/usr/bin/env python3
"""Multimodal curation driver — the media-column pipeline in one job.

Chains the engine's media operators the way an image curation run
would: perceptual-hash near-dup ADMISSION over genuinely decoded
pixels -> metadata harvest (tEXt / COM / EXIF, walk-only) -> parquet
survivors + one JSON funnel line. (Audio features live in
multimodal.audio_features / mp4_audio_features and their queries;
this driver curates the image axis.)

    spark-submit --py-files dist/toyocr_spark.zip jobs/media_job.py \\
        --media <parquet with (media_id, payload)> --output <dir>
    # or synthesize the demo corpus from a documents table:
    ... --synth-from <documents parquet> --output <dir>

Scale shape mirrors prep_job: every decode is a map-only mapInArrow
kernel; the near-dup pairing shuffles only (band, bucket) keys;
metadata and health stats never decode pixel/PCM bodies.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="toyocr_spark media curation job")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--media", help="parquet with (media_id, payload binary)")
    src.add_argument(
        "--synth-from",
        help="documents parquet; synthesizes the deterministic PNG demo corpus",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--neardup-hamming", type=int, default=3,
        help="dHash admission radius (negative = stage off)",
    )
    ap.add_argument(
        "--skip-metadata", action="store_true",
        help="skip the tEXt/COM/EXIF harvest stage",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from toyocr_spark.multimodal import image_dhash, media_metadata

    spark = SparkSession.builder.appName("toyocr-media").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    funnel: dict = {"metric": "media curation funnel"}

    if args.synth_from:
        from toyocr_spark.multimodal import synth_dhash_png

        docs = spark.read.parquet(args.synth_from)
        media = synth_dhash_png(docs, n_docs=160)
    else:
        media = spark.read.parquet(args.media).select("media_id", "payload")
    media = media.localCheckpoint()  # reused by every stage below
    funnel["input"] = media.count()

    # 1. perceptual-hash near-dup admission over decoded pixels.
    #    Anti-join on the DROP set: payloads image_dhash cannot decode
    #    produce no hash row and pass through (skip, don't reject).
    if args.neardup_hamming >= 0:
        from toyocr_spark.operators.dedup import simhash64_pairs

        sim = (
            image_dhash(media)
            .withColumnRenamed("media_id", "id")
            .select("id", "c0", "c1", "c2", "c3")
        )
        drops = (
            simhash64_pairs(sim, max_hamming=args.neardup_hamming)
            .select(F.col("id_b").alias("media_id"))
            .distinct()
        )
        media = media.join(drops, "media_id", "left_anti")
        funnel["after_neardup"] = media.count()

    # 2. metadata harvest (walk-only: no pixel/PCM decode)
    if not args.skip_metadata:
        meta = media_metadata(media)
        funnel["metadata_rows"] = meta.count()
        meta.write.mode("overwrite").parquet(f"{args.output}/metadata")

    media.write.mode("overwrite").parquet(f"{args.output}/media")
    print(json.dumps(funnel))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Adaptive recrawl scheduling — change-rate estimation over per-URL
snapshot histories and the freshness-bucket assignment every crawler
runs (the Cho & Garcia-Molina loop). Batch operator here; the
incremental twin is streaming/ingest.stream_recrawl, whose per-batch
state rows are the MONOID summaries fold_change_segments combines —
stream == batch is asserted by tests/test_streaming.py.

Reference analogue: COUNT-driven planning / dataset statistics at
/root/reference/data/build.py (the repeat-factor computation) — here
the statistic drives the recrawl frequency instead of the sampling
rate.

Scale shape: ONE shuffle on url-hash, O(1) carried state per url
(the previous digest) — survives 10^12 urls and any number of
snapshots per url."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def change_counts(obs: DataFrame) -> DataFrame:
    """(url, n_changes) from observation rows (url, snap_t, digest):
    one url-keyed window pass counting digest transitions."""
    w = Window.partitionBy("url").orderBy("snap_t")
    return (
        obs.withColumn("prev", F.lag("digest").over(w))
        .withColumn(
            "chg",
            (
                F.col("prev").isNotNull() & (F.col("digest") != F.col("prev"))
            ).cast("int"),
        )
        .groupBy("url")
        .agg(F.sum("chg").cast("int").alias("n_changes"))
    )


def schedule_buckets(changed: DataFrame) -> DataFrame:
    """Rate -> recrawl-frequency bucket, a pure Column map over
    (url, n_changes)."""
    return changed.select(
        "url",
        "n_changes",
        F.when(F.col("n_changes") >= 4, F.lit("hourly"))
        .when(F.col("n_changes") >= 2, F.lit("daily"))
        .when(F.col("n_changes") >= 1, F.lit("weekly"))
        .otherwise(F.lit("monthly"))
        .alias("bucket"),
    )


def change_segment(obs: DataFrame, seq: int) -> DataFrame:
    """The per-micro-batch MONOID summary the streaming twin persists:
    one row per url with (seq, first/last snapshot digest by time,
    within-segment transition count). Two segments combine by adding
    `within` counts plus one boundary transition when the earlier
    segment's last digest differs from the later's first — an
    associative fold, so any time-ordered segmentation of the same
    observations yields the same total (stream == batch)."""
    w = Window.partitionBy("url").orderBy("snap_t")
    return (
        obs.withColumn("prev", F.lag("digest").over(w))
        .withColumn(
            "chg",
            (
                F.col("prev").isNotNull() & (F.col("digest") != F.col("prev"))
            ).cast("int"),
        )
        .groupBy("url")
        .agg(
            F.lit(seq).cast("long").alias("seq"),
            F.min(F.struct("snap_t", "digest")).alias("_first"),
            F.max(F.struct("snap_t", "digest")).alias("_last"),
            F.sum("chg").cast("int").alias("within"),
            F.count("*").cast("long").alias("n_obs"),
        )
        .select(
            "url",
            "seq",
            F.col("_first.snap_t").alias("first_t"),
            F.col("_first.digest").alias("first_digest"),
            F.col("_last.snap_t").alias("last_t"),
            F.col("_last.digest").alias("last_digest"),
            "within",
            "n_obs",
        )
    )


def fold_change_segments(segments: DataFrame) -> DataFrame:
    """(url, n_changes) from per-batch monoid summaries: within-counts
    add, plus one boundary transition per adjacent segment pair whose
    digests differ (the associative combine of change_segment)."""
    w = Window.partitionBy("url").orderBy("seq", "first_t")
    return (
        segments.withColumn("prev_last", F.lag("last_digest").over(w))
        .withColumn(
            "boundary",
            (
                F.col("prev_last").isNotNull()
                & (F.col("first_digest") != F.col("prev_last"))
            ).cast("int"),
        )
        .groupBy("url")
        .agg((F.sum("within") + F.sum("boundary")).cast("int").alias("n_changes"))
    )



def revalidation_report(obs: DataFrame) -> DataFrame:
    """(url, n_caps, n_not_modified) from observation rows: a re-fetch
    whose digest matches the previous capture could have been a 304
    Not-Modified (the q179 conditional-GET pricing, at the operator
    grain). Same one-window shape as change_counts — and the two are
    complements: n_not_modified == n_caps - 1 - n_changes, which is
    what lets revalidation_from_state read the SAME streaming segment
    log the recrawl scheduler keeps, with no second state store."""
    w = Window.partitionBy("url").orderBy("snap_t")
    return (
        obs.withColumn("prev", F.lag("digest").over(w))
        .withColumn(
            "nm",
            (
                F.col("prev").isNotNull() & (F.col("digest") == F.col("prev"))
            ).cast("int"),
        )
        .groupBy("url")
        .agg(
            F.count("*").cast("long").alias("n_caps"),
            F.sum("nm").cast("long").alias("n_not_modified"),
        )
    )


def revalidation_from_state(segments: DataFrame) -> DataFrame:
    """revalidation_report derived from the recrawl MONOID segments
    alone: capture counts add across segments and not-modified counts
    are the complement of the folded change count — so the ONE state
    log stream_recrawl already persists also answers the
    conditional-GET planning question (asserted equal to the batch
    report in tests/test_operators.py)."""
    caps = segments.groupBy("url").agg(F.sum("n_obs").cast("long").alias("n_caps"))
    folded = fold_change_segments(segments)
    return caps.join(folded, "url").select(
        "url",
        "n_caps",
        (F.col("n_caps") - 1 - F.col("n_changes")).cast("long").alias("n_not_modified"),
    )

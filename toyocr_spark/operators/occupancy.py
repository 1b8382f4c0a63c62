"""Occupancy projection (A8/M4): per-axis OR-aggregate of interval
extents into a bucketed 1-D histogram — the XY-cut projection
(/root/reference/data/transforms/transform_cropresize.py:143-160) as a
group-by.

explode(sequence(lo_bucket, hi_bucket)) fans each interval out to the
buckets it covers; groupBy(bucket) with max/count is the OR/weight
aggregate. Shuffle volume = total covered buckets — bounded by
range/bucket_width, independent of row count ordering; partial
aggregation combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def occupancy_projection(
    df: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """[start,end) intervals -> (bucket, occupied, weight) histogram,
    optionally per group. ``occupied`` is the OR (always 1 for emitted
    buckets — absent buckets are the zeros), ``weight`` counts covering
    intervals (the graded-score variant, K4's shrink-tower analogue)."""
    lo = (F.col(start_col) / bucket_width).cast("long")
    hi = ((F.col(end_col) - 1) / bucket_width).cast("long")
    keys = [F.col(c) for c in (group_cols or [])]
    exploded = df.filter(F.col(end_col) > F.col(start_col)).select(
        *keys, F.explode(F.sequence(lo, hi)).alias("bucket")
    )
    return exploded.groupBy(*keys, "bucket").agg(
        F.lit(1).alias("occupied"), F.count("*").alias("weight")
    )

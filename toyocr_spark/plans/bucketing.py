"""Bucketed tables: the shuffle-free repeated-join path.

At 100 TB the same join runs thousands of times (every incremental
batch joins pages to the same host/dimension tables). Bucketing
pre-shuffles ONCE at write time: both sides hash-partitioned into the
same bucket count on the join key, files laid out per bucket, so every
later sort-merge join on that key skips both Exchange nodes entirely —
the join cost drops from (shuffle both sides + sort + merge) to
(local sort + merge) per bucket pair.

Uses Spark's built-in catalog bucketing (`bucketBy` + `saveAsTable`) —
no Hive metastore needed; the bucket spec rides the catalog table
metadata and `spark.sql.sources.bucketing.enabled` (default on) lets
the planner trust it. The Iceberg-proper analogue is a bucket
partition transform on the table spec; this module is the
catalog-portable version of the same contract.

Design contract (locked by tests/test_plans.py):
  * joining two tables bucketed on the same key with the same bucket
    count plans ZERO Exchange nodes;
  * a grouped aggregate on the bucket key also skips its Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally
    sorted) on ``key``. The one-time shuffle that amortizes every
    later join/agg on the same key."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Inner-join two bucketed catalog tables on their bucket key.
    With matching bucket specs this plans as a sort-merge join with no
    Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
